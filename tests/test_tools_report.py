"""Regression guard for tools/profile_layers.py's per-op aggregation.

The round-3 bug: the per-op table summed each op's duration across every
traced iteration while the header reported a per-iteration module total, so
per-op costs read N-iterations too large (a 4x error at --iters 4 that
inflated the BN-chain slack estimate and motivated a losing kernel project —
PARITY.md "Fused-BN experiment"). The report must divide by --iters and keep
whole-module rows (the jit program events and bare per-iteration digit rows)
out of the op table and its percentages.
"""

import argparse
import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_profile_layers():
    spec = importlib.util.spec_from_file_location(
        "profile_layers", REPO / "tools" / "profile_layers.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["profile_layers"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_report_divides_by_iters_and_skips_module_rows(capsys):
    mod = _load_profile_layers()
    args = argparse.Namespace(iters=4, batch=128, top=10)
    events = []
    for it in range(4):
        # Whole-module rows: the jit program event and a bare digit row.
        events.append({"name": "jit_train_step", "dur": 250_000.0})
        events.append({"name": str(it), "dur": 250_000.0})
        # Two real ops, 8 ms and 2 ms per iteration.
        events.append({"name": "fusion.117", "dur": 8_000.0,
                       "args": {"long_name": "adam update"}})
        events.append({"name": "convert_reduce_fusion", "dur": 2_000.0,
                       "args": {}})
    mod.report(args, events, "jit_train_step")
    out = capsys.readouterr().out
    lines = {ln.split()[0]: ln.split() for ln in out.splitlines()
             if ln and not ln.startswith(("module", "op"))}

    # Module rows excluded from the table entirely.
    assert "jit_train_step" not in lines and "0" not in lines

    # ms/iter, not the 4-iteration sum (8.0, not 32.0).
    assert float(lines["fusion.117"][1]) == 8.0
    assert float(lines["convert_reduce_fusion"][1]) == 2.0

    # Percentages over op time only: 8/(8+2) = 80%.
    assert float(lines["fusion.117"][2]) == 80.0

    # Header still reports the per-iteration module total (250 ms/iter).
    assert "250.00 ms/iter" in out
