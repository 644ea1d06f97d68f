"""Config-driven trainer CLI smokes for the parallel layout: `tp_devices`
composes tensor parallelism with data parallelism — mesh (data, model) — and a
tp(2) x dp(2) step must equal the plain dp(2) step (TP is data layout, not
math; sharding/tp.py). Reference capability anchor: 48-head attention,
`attention_processor.py:1885-1954` (SURVEY §2.3 optional TP target)."""

import os
import re
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_train(tmp_path, name, extra_cfg, script="train_to2v.py", steps=2):
    cfg = f"""
name_prefix: {name}
output_dir: {tmp_path}/out_{name}
seed: 7
per_gpu_batch_size: 1
max_train_steps: {steps}
{extra_cfg}
"""
    cfg_path = tmp_path / f"{name}.yaml"
    cfg_path.write_text(cfg)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, os.path.join(_REPO, script),
         "--config", str(cfg_path), "--smoke", "--max-steps", str(steps)],
        capture_output=True, text=True, timeout=1500, env=env, cwd=_REPO)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    return res


def _step0_loss(stdout: str) -> float:
    m = re.search(r"step 0: loss ([0-9.]+)", stdout)
    assert m, stdout[-2000:]
    return float(m.group(1))


@pytest.mark.slow
def test_to2v_lora_smoke(tmp_path):
    """`lora_rank` config key drives LoRA end to end: factors initialised,
    steps run, and the merged export lands in the run dir (reference peft
    path `train_cogvideo_to2v.py:1326-1338`, here config-reachable)."""
    import glob

    res = _run_train(tmp_path, "lora", "lora_rank: 4\nlora_alpha: 8.0")
    assert re.search(r"lora: rank=4 alpha=8\.0 .*M params", res.stdout), \
        res.stdout[-2000:]
    assert "lora-merged export saved" in res.stdout
    merged = glob.glob(str(tmp_path / "out_lora" / "*" / "lora_merged" / "*"))
    assert merged, res.stdout[-2000:]
    _step0_loss(res.stdout)  # loss parsed == finite float


@pytest.mark.slow
def test_t2to_lora_smoke(tmp_path):
    import glob

    res = _run_train(tmp_path, "lorat2", "lora_rank: 4\nlora_alpha: 8.0",
                     script="train_t2to.py")
    assert re.search(r"lora: rank=4", res.stdout), res.stdout[-2000:]
    assert "lora-merged export saved" in res.stdout
    merged = glob.glob(str(tmp_path / "out_lorat2" / "*" / "lora_merged" / "*"))
    assert merged, res.stdout[-2000:]
    _step0_loss(res.stdout)


@pytest.mark.slow
def test_to2v_tp2_matches_dp(tmp_path):
    """tp(2) x dp(2) == dp(2): identical seed/synthetic data, same global
    batch, same stratification ranks — step-0 loss must match."""
    ref = _run_train(tmp_path, "dp2",
                     "dp_devices: 2\ntp_devices: 1\nzero1: true")
    tp = _run_train(tmp_path, "tp2",
                    "dp_devices: 2\ntp_devices: 2\nzero1: true")
    assert "tensor parallel: tp=2 x dp=2 mesh" in tp.stdout
    l_ref, l_tp = _step0_loss(ref.stdout), _step0_loss(tp.stdout)
    assert abs(l_ref - l_tp) < 1e-3, (l_ref, l_tp)


@pytest.mark.slow
def test_to2v_sp2_matches_dp(tmp_path):
    """sp(2) x dp(2) == dp(2): Ulysses sequence parallelism is data layout,
    not math — the all_to_all re-shard around the unchanged kernel must leave
    the training step numerically intact (kernels/attention.py sp_axis)."""
    ref = _run_train(tmp_path, "dp2r",
                     "dp_devices: 2\ntp_devices: 1\nzero1: true")
    sp = _run_train(tmp_path, "sp2",
                    "dp_devices: 2\nsp_devices: 2\nzero1: true")
    assert "sequence parallel (Ulysses): sp=2 x dp=2 mesh" in sp.stdout
    l_ref, l_sp = _step0_loss(ref.stdout), _step0_loss(sp.stdout)
    assert abs(l_ref - l_sp) < 1e-3, (l_ref, l_sp)


@pytest.mark.slow
def test_t2to_tp2_smoke(tmp_path):
    """T2To full-finetune trainer runs green on a tp(2) x dp(2) mesh."""
    res = _run_train(tmp_path, "t2totp2",
                     "dp_devices: 2\ntp_devices: 2\nzero1: true\n"
                     "gradient_accumulation_steps: 2",
                     script="train_t2to.py", steps=2)
    assert "tensor parallel: tp=2 x dp=2 mesh" in res.stdout
    assert "training done" in res.stdout


@pytest.mark.slow
def test_t2to_sp2_smoke(tmp_path):
    """T2To full-finetune trainer runs green on an sp(2) x dp(2) mesh (the
    padded-chunk key_bias mask rides the sp shard_map replicated)."""
    res = _run_train(tmp_path, "t2tosp2",
                     "dp_devices: 2\nsp_devices: 2\nzero1: true\n"
                     "gradient_accumulation_steps: 2",
                     script="train_t2to.py", steps=2)
    assert "sequence parallel (Ulysses): sp=2 x dp=2 mesh" in res.stdout
    assert "training done" in res.stdout
