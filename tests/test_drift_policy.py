"""The shipped quantization default must match its committed drift evidence.

`configs/infer_edit.yaml` / `infer_gen.yaml` ship `quant: w8a8` as the serving
default. That policy rests on the measured drift studies (PERF.md; raw JSONs
committed under `tools/results/drift_r5/`). These tests recompute the policy
gates from the committed evidence, so a config flip or an evidence regression
fails CI rather than silently shipping an unbacked default — the same
test-asserts-the-claim pattern as `test_memory_budget.py` and
`test_train_throughput.py`.

Reference geometry being evidenced: 52 DPM steps, `num_partitions=4`
(8 lookahead ranks), stochastic DPM — `cogvideo_sampling_mp_fifo.py:223-334`,
`config/infer/edit.yaml:8-10`.
"""

import json
import os

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVIDENCE = os.path.join(REPO, "tools", "results", "drift_r5")
CONFIGS = os.path.join(REPO, "tokensgen_tpu", "configs")


def _config_quant(name):
    with open(os.path.join(CONFIGS, name)) as f:
        return yaml.safe_load(f).get("quant")


def test_edit_default_backed_by_production_geometry_evidence():
    """`infer_edit.yaml` ships w8a8 for the To2V FIFO path -> the committed
    production-geometry FIFO drift arm must exist, be flat, and sit at
    quantization-noise scale."""
    if _config_quant("infer_edit.yaml") != "w8a8":
        return  # policy changed to bf16: no evidence required
    path = os.path.join(EVIDENCE, "drift_w8a8_s52_c2_l42_p4_st.json")
    assert os.path.exists(path), (
        "quant: w8a8 shipped without production-geometry drift evidence")
    with open(path) as f:
        d = json.load(f)
    s = d["summary"]
    # the evidence must actually be the shipped geometry
    assert s["steps"] == 52 and s["num_partitions"] == 4 and s["stochastic"]
    assert s["layers"] == 42, "evidence must be full depth"
    assert s["iters_compared"] >= 50, "need a long-horizon iteration axis"
    # quantization-noise scale, not drift: r5 measured ~2.1e-6 max
    assert s["rel_latent_mse_max"] < 1e-4, s
    # FLAT curve: no compounding across FIFO recycling
    series = d["rel_mse"]
    assert series[-1] < 3 * series[0], (series[0], series[-1])
    assert max(series) < 3 * series[0]


def test_gen_default_backed_by_t2to_evidence():
    """`infer_gen.yaml` applies w8a8 to the T2To token DiT too -> the
    committed token-stage drift arm must exist and the post-PCA token frames
    (what actually seeds To2V) must sit at quantization-noise scale."""
    if _config_quant("infer_gen.yaml") != "w8a8":
        return
    path = os.path.join(EVIDENCE, "drift_t2to_w8a8_s52_c2_l42.json")
    assert os.path.exists(path), (
        "gen config ships quant: w8a8 (applied to the T2To stage by infer.py) "
        "without a T2To drift arm")
    with open(path) as f:
        s = json.load(f)
    assert s["steps"] == 52 and s["layers"] == 42
    assert s["t2to_token_frame_rel_mse"] < 1e-2, s
