"""Training harness (upstream:main.py; SURVEY.md §2 C1, §3.1): pjit train/eval
steps over a data mesh, SGD+momentum with step decay, orbax checkpoints,
CSV logging, comparison PNGs."""
