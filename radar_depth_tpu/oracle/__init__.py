"""torch-CPU oracle of the reference pipeline.

The reference mount is empty and real nuScenes is unreachable (SURVEY.md
provenance note), so parity is anchored to this independent torch
implementation written from SURVEY.md §2/§3's description of
upstream:models.py — NOT copied from anywhere. It exists only for tests
(weight-converted forward-pass parity within float tolerance, per
BASELINE.json) and must stay scrupulously faithful to the survey.

Module attribute names intentionally mirror the flax param tree one-to-one so
state_dict keys convert mechanically (utils/torch_convert.py).
"""
