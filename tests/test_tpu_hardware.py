"""Hardware-gated real-TPU validation (VERDICT r1 item 5).

The suite's conftest pins the JAX platform to CPU, so the TPU run happens
in a subprocess (tests/tpu_validation.py). Gated behind the `tpu` marker
AND the TD_TPU=1 env var because the remote-TPU tunnel on this machine is
slow and can wedge:

    TD_TPU=1 python -m pytest tests/test_tpu_hardware.py -m tpu -v
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest


@pytest.mark.tpu
@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("TD_TPU") != "1",
                    reason="set TD_TPU=1 to run against the live TPU")
def test_fused_pipeline_bit_exact_on_tpu():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, str(Path(__file__).parent / "tpu_validation.py")],
        capture_output=True, text=True, timeout=900, env=env,
    )
    sys.stdout.write(proc.stdout[-2000:])
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["ok"] is True
