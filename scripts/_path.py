"""Shared sys.path bootstrap for scripts run as ``python scripts/<x>.py``.

Import this first in any script under scripts/ (including scripts/demo/):
it walks up from the importing file until it finds the repo root (the
directory containing the ``adv_grpo_tpu`` package) and prepends it to
sys.path — one canonical snippet instead of per-script dirname nesting.
"""

import os
import sys

_d = os.path.dirname(os.path.abspath(__file__))
while not os.path.isdir(os.path.join(_d, "adv_grpo_tpu")):
    parent = os.path.dirname(_d)
    if parent == _d:
        raise RuntimeError("adv_grpo_tpu package root not found above scripts/")
    _d = parent
if _d not in sys.path:
    sys.path.insert(0, _d)
