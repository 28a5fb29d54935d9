"""Device mesh + sharding — the framework's distribution layer.

The reference's only multi-device path is an in-graph-replication
ParallelModel whose module is MISSING from the repo (model_multi.py:
2556-2559) — multi-GPU is dead code there. Here distribution is
first-class and TPU-native (SURVEY.md §2.4):

  * a 2D logical mesh (data, view): batch sharded over `data` (DP), the
    view axis optionally sharded over `view` (the framework's
    sequence-parallel analog — each device unprojects its views into
    partial voxel grids; XLA inserts the psum/all-gather for the fusion
    reduction over ICI);
  * parameters replicated; XLA SPMD inserts gradient all-reduce;
  * an optional third `model` axis for tensor parallelism: Megatron-style
    output-channel sharding of conv/dense kernels (shard_params /
    shard_state_tp) — GSPMD derives the activation shardings and inserts
    the all-gathers/reduce-scatters, so TP composes with DP and view
    sharding on the same mesh. Exactness vs single-device is proven for
    TP x DP and for the full view x model x data composition
    (tests/test_parallel.py; the latter RUN_HEAVY_PARITY-gated for
    runtime). An earlier XLA:CPU partitioner heap-crash on view-sharded
    activations hitting model-sharded conv kernels no longer reproduces
    on jax 0.9.0, so all mesh compositions are CPU-testable;
  * multi-host: `jax.distributed.initialize` + per-host data sharding via
    the same specs.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)


def make_mesh(data=None, view=1, model=1, devices=None):
    """Create a (data, view[, model]) mesh over available devices. The
    `model` axis (tensor parallelism) is only materialized when > 1 so
    existing 2-axis callers and their compiled programs are unchanged."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // (view * model)
    assert data >= 1, (
        f"not enough devices: {n} < view({view}) x model({model})")
    assert data * view * model <= n, (
        f"mesh {data}x{view}x{model} > {n} devices")
    devices = devices[:data * view * model]
    if model > 1:
        dev_array = mesh_utils.create_device_mesh((data, view, model),
                                                  devices=devices)
        return Mesh(dev_array, axis_names=("data", "view", "model"))
    dev_array = mesh_utils.create_device_mesh((data, view),
                                              devices=devices)
    return Mesh(dev_array, axis_names=("data", "view"))


def batch_sharding(mesh, view_sharding=False):
    """NamedSharding per batch key. Batch axis 0 -> 'data'; the view axis
    (axis 1 of images/Rcam/depths) -> 'view' when view_sharding."""
    vs = "view" if view_sharding else None
    spec = {
        "images": P("data", vs),
        "image_meta": P("data"),
        "anchors": P(),                 # replicated constant
        "Rcam": P("data", vs),
        "Kmat": P("data"),
        "depths": P("data", vs),
        "gt_class_ids": P("data"),
        "gt_boxes": P("data"),
        "gt_masks": P("data"),
        "rpn_match": P("data"),
        "rpn_bbox": P("data"),
    }
    return {k: NamedSharding(mesh, v) for k, v in spec.items()}


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, shardings):
    """Place a host batch onto the mesh with the given shardings."""
    return {
        k: jax.device_put(v, shardings[k]) if k in shardings else v
        for k, v in batch.items()
    }


def make_parallel_train_step(train_step, mesh, view_sharding=False):
    """Wrap a jitted train step with mesh shardings: state replicated, batch
    data(+view)-sharded. XLA SPMD handles the collectives.

    The state really is placed: a host-resident (or differently-placed)
    state is replicated over the mesh on the first call — device-resident
    replicated states pass through device_put as a no-op — so the
    documented contract holds without callers invoking replicate_state
    themselves. Leaves that ALREADY carry a NamedSharding on this mesh
    (e.g. tensor-parallel params/opt_state placed by shard_state_tp) are
    left alone: re-placing them as replicated would silently all-gather
    the TP sharding away on every step."""
    b_shard = batch_sharding(mesh, view_sharding)
    rep = replicated(mesh)

    def place(x):
        s = getattr(x, "sharding", None)
        if isinstance(s, NamedSharding) and s.mesh == mesh:
            return x
        return jax.device_put(x, rep)

    def step(state, batch, rng):
        state = jax.tree_util.tree_map(place, state)
        batch = shard_batch(batch, b_shard)
        return train_step(state, batch, rng)

    return step


def replicate_state(state, mesh):
    rep = replicated(mesh)
    return jax.device_put(state, rep)


def param_spec(x, mesh):
    """Tensor-parallel placement rule for one parameter leaf: shard the
    output-channel (last) dim of conv/dense kernels over `model`
    (Megatron-style); replicate vectors (biases, BN scales/stats) and
    anything not divisible. Shape-based, so the identical rule applies to
    optimizer-momentum leaves, keeping param/opt shardings congruent."""
    if "model" not in mesh.axis_names:
        return P()
    m = mesh.shape["model"]
    shape = getattr(x, "shape", ())
    if len(shape) >= 2 and shape[-1] % m == 0 and shape[-1] >= 2 * m:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def shard_params(tree, mesh):
    """device_put a parameter(-shaped) pytree with the TP rule."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, param_spec(x, mesh))),
        tree)


def shard_state_tp(state, mesh):
    """Place a TrainState for a TP(+DP/view) mesh: params and optimizer
    state sharded by the channel rule, everything else replicated. The
    train step itself is untouched — GSPMD propagates the kernel shardings
    through the forward/backward and inserts the collectives."""
    rep = replicated(mesh)
    return state.replace(
        params=shard_params(state.params, mesh),
        opt_state=shard_params(state.opt_state, mesh),
        batch_stats=jax.device_put(state.batch_stats, rep),
        step=jax.device_put(state.step, rep),
    )


# Env vars that signal a multi-process launch without touching the XLA
# backend (jax.process_count() would initialize it, after which
# jax.distributed.initialize() can never succeed).
_CLUSTER_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
    "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",
    "TPU_WORKER_HOSTNAMES", "CLOUD_TPU_TASK_ID",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host initialization (DCN across slices, ICI within — the
    reference has no multi-node story at all, SURVEY.md §2.4).

    MUST run before any other JAX call in the process. The multi-process
    signal is read from explicit args or cluster env vars only — never from
    jax.process_count(), which would initialize the backend and make
    jax.distributed.initialize() unconditionally fail. Returns True if the
    distributed runtime is (now) up, False for a plain single-process run.
    """
    explicit = (coordinator_address is not None or
                num_processes is not None or process_id is not None)
    if not explicit:
        cluster = any(v in os.environ for v in _CLUSTER_ENV_VARS
                      if v != "TPU_WORKER_HOSTNAMES")
        # TPU_WORKER_HOSTNAMES alone is only a cluster signal when it
        # names MULTIPLE hosts: single-chip tunnel environments (axon)
        # export it as "localhost", which must not trip a coordinator-
        # less jax.distributed.initialize (found by the round-5 CLI
        # end-to-end run: every CLI command crashed at startup here)
        hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if "," in hosts:
            cluster = True
        if not cluster:
            return False  # single-process: leave JAX untouched
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            log.warning("jax.distributed already initialized: %s", e)
            return True
        log.error("jax.distributed.initialize failed: %s", e)
        raise
    except ValueError as e:
        if explicit:
            raise
        # env-var auto-detect found a cluster-ish variable but JAX could
        # not derive a coordinator: fall back to single-process rather
        # than crashing a local run
        log.warning("jax.distributed auto-init failed (%s); continuing "
                    "single-process", e)
        return False
    return True


def host_local_batch_slice(global_batch_size):
    """This host's share of the global batch (per-host data loading:
    each host feeds its local shard of the `data` axis)."""
    n = jax.process_count()
    assert global_batch_size % n == 0
    per = global_batch_size // n
    start = jax.process_index() * per
    return slice(start, start + per)


def globalize_batch(batch, shardings):
    """Assemble global arrays from this process's local batch shard
    (multi-host DP: every host loads its own slice of the `data` axis and
    the global array is stitched logically — no host ever materializes the
    full batch). Keys without a sharding pass through unchanged."""
    out = {}
    for k, v in batch.items():
        if k in shardings:
            out[k] = jax.make_array_from_process_local_data(
                shardings[k], np.asarray(v))
        else:
            out[k] = v
    return out
