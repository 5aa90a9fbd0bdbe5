"""The committed on-chip validation harness (tools/tpu_conformance.py)
runs end-to-end in interpret mode and passes its budgets — so the
BASELINE fidelity table is reproducible from the repo on any backend."""

import json
import os
import sys


TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)


def test_conformance_harness_interpret(capsys):
    import tpu_conformance

    rc = tpu_conformance.main(
        ["--interpret", "--levels", "3", "--stft-windows", "2", "--json"]
    )
    out = capsys.readouterr().out
    report = json.loads(out.strip().splitlines()[-1])
    assert rc == 0 and report["pass"]
    assert report["integrated_max_err_lu"] <= 0.1
    assert report["true_peak_max_err_db"] <= 0.1
    assert report["stft_pooled_max_err_db"] <= 0.1
