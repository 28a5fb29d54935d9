"""Multi-host execution: 2 real OS processes on a jax.distributed local
cluster (gloo CPU collectives) running init_distributed +
host_local_batch_slice + globalize_batch + one data-parallel optimizer
step, verified against a single-process oracle on the concatenated batch.

The full flagship model under the same mesh machinery is exercised by
__graft_entry__.dryrun_multichip (8 virtual devices, single process);
this test covers what that cannot: real process boundaries, the
coordination service, and cross-process gradient all-reduce.
"""

import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r'''
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
sys.path.insert(0, {repo!r})

import numpy as np
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P
from mulit_view_object_detection_tpu.parallel.mesh import (
    globalize_batch, host_local_batch_slice, init_distributed, make_mesh,
    replicated)

assert init_distributed(coordinator_address=f"127.0.0.1:{{port}}",
                        num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 2          # one CPU device per process

# deterministic global batch; every host loads ONLY its slice
full_x = np.arange(8 * 6, dtype=np.float32).reshape(8, 6) / 10.0
full_y = (np.arange(8) % 2).astype(np.float32)
sl = host_local_batch_slice(8)
assert sl == slice(pid * 4, pid * 4 + 4)

mesh = make_mesh()                       # (data=2,) over global devices
shardings = {{"x": NamedSharding(mesh, P("data")),
             "y": NamedSharding(mesh, P("data"))}}
batch = globalize_batch({{"x": full_x[sl], "y": full_y[sl]}}, shardings)
assert batch["x"].shape == (8, 6)       # global logical shape

params = {{"w": jnp.ones((6,)) * 0.1, "b": jnp.zeros(())}}
params = jax.device_put(params, replicated(mesh))
tx = optax.sgd(0.5, momentum=0.9)
opt_state = jax.device_put(tx.init(params), replicated(mesh))

def loss_fn(p, b):
    pred = b["x"] @ p["w"] + p["b"]
    return jnp.mean((pred - b["y"]) ** 2)

@jax.jit
def step(p, s, b):
    loss, grads = jax.value_and_grad(loss_fn)(p, b)
    updates, s = tx.update(grads, s, p)
    return optax.apply_updates(p, updates), s, loss

new_params, opt_state, loss = step(params, opt_state, batch)
w = np.asarray(new_params["w"])          # replicated -> addressable
np.save(f"{{outdir}}/w_{{pid}}.npy", w)
np.save(f"{{outdir}}/loss_{{pid}}.npy", np.asarray(loss))
print(f"proc {{pid}} OK loss={{float(loss):.6f}}", flush=True)
'''


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_data_parallel_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=repo))
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one CPU device per process, not 8
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    # both processes computed the same synced update
    w0 = np.load(tmp_path / "w_0.npy")
    w1 = np.load(tmp_path / "w_1.npy")
    np.testing.assert_allclose(w0, w1, rtol=1e-6)

    # and it equals the single-process oracle over the FULL global batch
    full_x = np.arange(8 * 6, dtype=np.float32).reshape(8, 6) / 10.0
    full_y = (np.arange(8) % 2).astype(np.float32)
    w = np.ones(6, np.float32) * 0.1
    b = 0.0
    pred = full_x @ w + b
    grad_w = 2.0 / 8.0 * full_x.T @ (pred - full_y)
    expected = w - 0.5 * grad_w           # first SGD step, zero momentum
    np.testing.assert_allclose(w0, expected, rtol=1e-4)

    loss0 = float(np.load(tmp_path / "loss_0.npy"))
    expected_loss = float(np.mean((pred - full_y) ** 2))
    np.testing.assert_allclose(loss0, expected_loss, rtol=1e-5)
