#!/bin/bash
# Round-5 queue, stage 5 — Phase J (96x160 severity chains, seeds 44+45)
# then Phase T, skipping the I44 full-res retrain. Rationale (time-boxed
# decision, ~3h of session left after a third relay wedge): the 4-seed
# full-res crossing table (VERDICT r4 #1) is complete without I44 — the
# sd44 EVALS were committed before the host reboot; the retrain's unique
# adds are a full-res determinism replica (already demonstrated at 96x160
# by Phase K's bit-identical coarse rows) and a second full-res sweep
# seed. Phase J is VERDICT r4 #8 by name (severity table 2 -> 4 seeds)
# and its shorter chains land evidence incrementally. Exists as its own
# script so queue_guard.sh relaunches resume THESE phases.
exec bash "$(dirname "$0")/r5_queue4.sh" JT
