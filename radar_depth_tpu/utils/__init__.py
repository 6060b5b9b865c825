"""Host-side utilities: CSV logging, qualitative viz panels, torch checkpoint
conversion (upstream:utils.py; SURVEY.md §2 C10/C11)."""
