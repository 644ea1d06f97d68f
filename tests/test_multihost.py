"""Multi-host entry: 2 coordinated processes x 2 virtual CPU devices each run
one To2V train step over the global 4-way data mesh (SURVEY §2.3 / §7.2-8).

Exercises `initialize_multihost` (jax.distributed + Gloo CPU collectives),
`process_batch_shard`, and the multi-process path of `shard_batch`
(`jax.make_array_from_process_local_data`).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np

_CHILD = os.path.join(os.path.dirname(__file__), "_multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_step(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # child sets its own device count
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    procs = [
        subprocess.Popen(
            [sys.executable, _CHILD, str(port), str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out[-3000:]}"

    losses = {}
    for out in outs:
        m = re.search(r"MULTIHOST_LOSS (\d) ([\d.eE+-]+)", out)
        assert m, out[-3000:]
        losses[int(m.group(1))] = float(m.group(2))
    assert set(losses) == {0, 1}
    assert np.isfinite(losses[0])
    # same global batch + psum'd grads -> identical loss on both hosts
    assert abs(losses[0] - losses[1]) < 1e-6, losses
