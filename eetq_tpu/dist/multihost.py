"""Multi-host initialization and hybrid (ICI x DCN) mesh construction.

The reference has no distributed layer at all (SURVEY.md §2.3: its only
rank-awareness is a log filter). This module is the multi-host entry for
the TPU build: initialize the JAX distributed runtime, then build a mesh
whose tensor-parallel axis rides ICI within a slice and whose data-parallel
axis spans slices over DCN — the layout BASELINE.md's scaling target
(1 chip -> 1 host -> 2+ hosts at >= 85% efficiency) assumes.

Typical multi-host serving setup (same program on every host):

    from eetq_tpu.dist import multihost
    multihost.initialize()                      # no-op on single host
    mesh = multihost.make_hybrid_mesh(tp=8)     # tp over ICI, dp over DCN
    model = AutoEETQForCausalLM.from_quantized(path).shard(mesh=mesh)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from eetq_tpu.dist.sharding import DATA_AXIS, MODEL_AXIS
from eetq_tpu.utils.logging import get_logger

log = get_logger(__name__)


def initialize(**kwargs) -> None:
    """Initialize jax.distributed across hosts (coordinator discovery via
    TPU metadata or the explicit kwargs jax.distributed.initialize takes).
    Safe no-op when already initialized or on a single process.

    Order matters: jax.distributed.initialize() must run BEFORE anything
    that initializes the XLA backend — even jax.process_count() does — so
    the only pre-checks allowed here are jax.distributed's own state."""
    if jax.distributed.is_initialized():
        return
    try:
        jax.distributed.initialize(**kwargs)
        log.info(
            "jax.distributed initialized: process %d/%d",
            jax.process_index(), jax.process_count(),
        )
    except (RuntimeError, ValueError) as e:
        if "backend" in str(e).lower() or "initialize" in str(e).lower():
            # XLA already started (e.g. user touched jax.devices() first):
            # surface it — on multi-process setups this silently degrades
            # to per-host single-process execution.
            log.warning("jax.distributed.initialize failed: %s", e)
        else:
            # no coordinator configured: genuine single-process run
            log.debug("jax.distributed not initialized (%s); single-process", e)


def make_hybrid_mesh(
    tp: int | None = None,
    dp: int | None = None,
    devices=None,
) -> Mesh:
    """(dp, tp) mesh with tp mapped to ICI-contiguous devices.

    Defaults: tp = devices per process (one host's chips share ICI),
    dp = process count. On a single host this degenerates to
    dist.make_mesh. For multi-slice topologies, prefers
    mesh_utils.create_hybrid_device_mesh so dp crosses DCN and tp stays
    inside a slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        tp = max(1, jax.local_device_count())
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != device count {n}")

    if jax.process_count() > 1:
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(1, tp),
                dcn_mesh_shape=(dp, 1),
                devices=devices,
            )
            return Mesh(arr.reshape(dp, tp), (DATA_AXIS, MODEL_AXIS))
        except Exception as e:
            # No slice metadata (CPU multi-process, single-slice TPU):
            # group tp within a process so the model axis stays on
            # intra-host links and dp crosses processes.
            log.info("hybrid mesh unavailable (%s); process-grouped mesh", e)
            ordered = sorted(devices, key=lambda d: (d.process_index, d.id))
            return Mesh(
                np.asarray(ordered).reshape(dp, tp), (DATA_AXIS, MODEL_AXIS)
            )
    return Mesh(np.asarray(devices).reshape(dp, tp), (DATA_AXIS, MODEL_AXIS))
