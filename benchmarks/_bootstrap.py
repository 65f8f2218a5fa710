"""Make `tfmpc_tpu` importable when a benchmark runs as a plain script.

`python benchmarks/<tool>.py` puts benchmarks/ (not the repo root) on
sys.path, so the documented invocations only worked with PYTHONPATH set.
Each tool imports this module first; it is a no-op when the package is
already importable (e.g. installed, or PYTHONPATH set per the verify
recipe — the axon site must stay FIRST there, which appending the root
here preserves).
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.append(_ROOT)
