"""CPU smokes for the round-5 measurement tools.

The heavyweight runs happen on the TPU (BENCH_*_r05.json); these pin
that the tools keep working end to end at smoke scale — argument
parsing, the JSON-line contract, and the library plumbing they sit on.
"""

import json
import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")
if TOOLS not in sys.path:
    sys.path.insert(0, TOOLS)


def _json_line(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    assert out, "tool printed no stdout"
    return json.loads(out[-1])


def test_bench_soak_single_mode_smoke(capsys):
    import bench_soak

    bench_soak.main(["--volume-shape", "12", "14", "12", "--depth",
                     "10", "--duration", "2", "--rate", "20",
                     "--staging", "pool", "--rung", "4"])
    out = _json_line(capsys)
    assert out["metric"] == "serving_soak_rss"
    assert out["staging"] == "pool"
    assert out["requests"] > 0
    assert out["pool_fallbacks"] == 0


def test_bench_hpo300_smoke(capsys):
    import bench_hpo300

    bench_hpo300.main(["--trials", "4", "--parallel", "2",
                       "--subjects", "30", "8", "8"])
    out = _json_line(capsys)
    assert out["metric"] == "hpo_300_trials"
    assert out["n_trials"] == 4
    assert out["best_value"] is not None
    assert len(out["best_val_curve"]) >= 1
    assert out["n_buckets"] >= 1


@pytest.mark.parametrize("tool", ["bench_soak", "bench_hpo300",
                                  "fast_mode_study", "quality_eval"])
def test_tool_imports(tool):
    __import__(tool)
