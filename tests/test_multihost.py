"""Two-process jax.distributed CPU test for eetq_tpu.dist.multihost.

Spawns two fresh python processes that each call multihost.initialize()
(before ANY other XLA touch — the ordering the round-1 bug broke), build the
hybrid/process-grouped mesh, run a cross-process psum, and execute the real
TP/DP sharded model forward (dp=2 across processes). SURVEY.md §2.3
comm-backend row; the reference has no distributed layer at all."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, REPO)

coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

from eetq_tpu.dist import multihost

# must work BEFORE any jax.devices()/process_count() call
multihost.initialize(
    coordinator_address=coord, num_processes=nproc, process_id=pid
)
assert jax.distributed.is_initialized()
assert jax.process_count() == nproc, jax.process_count()

mesh = multihost.make_hybrid_mesh(tp=jax.local_device_count())
assert dict(mesh.shape) == {"data": nproc, "model": jax.local_device_count()}
# tp groups must be process-local (the model axis must not cross DCN)
for row in mesh.devices:
    assert len({d.process_index for d in row}) == 1, mesh.devices

import numpy as np
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from eetq_tpu.dist.sharding import DATA_AXIS, MODEL_AXIS

# 1. cross-process psum
fn = shard_map(
    lambda x: jax.lax.psum(x, (DATA_AXIS, MODEL_AXIS)),
    mesh=mesh,
    in_specs=P(DATA_AXIS, MODEL_AXIS),
    out_specs=P(DATA_AXIS, MODEL_AXIS),
    check_vma=False,
)
shape = mesh.devices.shape
sh = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))
vals = np.arange(jax.device_count(), dtype=np.float32).reshape(shape)
garr = jax.make_array_from_callback(shape, sh, lambda idx: vals[idx])
out = fn(garr)
local = np.asarray([s.data for s in out.addressable_shards])
expect = float(np.arange(jax.device_count()).sum())
assert np.allclose(local, expect), (local, expect)
print(f"WORKER {pid} PSUM OK", flush=True)

# 2. the real sharded model forward: dp=2 across processes, tp=1
from eetq_tpu.dist.sharding import make_forward_fn, cache_spec
from eetq_tpu.models import ModelConfig, random_dense_params
from eetq_tpu.models.transformer import forward, init_caches
from eetq_tpu.surgery.tp_reshard import quantize_params_tp, shard_quantized

cfg = ModelConfig(
    vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=1,
    num_heads=2, num_kv_heads=2, head_dim=16, max_position=64,
)
# same PRNG seed on every process -> identical params everywhere
dense = random_dense_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
qp = quantize_params_tp(dense, cfg, tp=1)
model = shard_quantized(qp, cfg, mesh)
fwd = make_forward_fn(model)

s = 8
rng = np.random.default_rng(0)
toks_np = rng.integers(1, cfg.vocab_size, size=(nproc, s)).astype(np.int32)
pos_np = np.broadcast_to(np.arange(s, dtype=np.int32), (nproc, s)).copy()

def gmake(arr, spec):
    shn = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, shn, lambda idx: arr[idx])

toks = gmake(toks_np, P(DATA_AXIS, None))
pos = gmake(pos_np, P(DATA_AXIS, None))
caches_local = init_caches(cfg, nproc, 32)
caches = [
    type(c)(
        k=gmake(np.asarray(c.k), cache_spec()),
        v=gmake(np.asarray(c.v), cache_spec()),
    )
    for c in caches_local
]
logits, _ = fwd(model.params, toks, pos, caches, jnp.int32(0))
mine = np.asarray(logits.addressable_shards[0].data)  # this process's row(s)

# oracle: single-process forward on the local rows
row = pid  # data shard i = process i (process-grouped mesh)
ref, _ = forward(
    qp, cfg, jnp.asarray(toks_np[row:row+1]), jnp.asarray(pos_np[row:row+1]),
    init_caches(cfg, 1, 32), jnp.int32(0),
)
err = np.abs(mine - np.asarray(ref)).max()
assert err < 0.05, err
print(f"WORKER {pid} OK", flush=True)

# 3. cross-host continuous batching (BASELINE config 5): the Engine runs
# the SAME deterministic schedule on every process over the dp=2 mesh —
# process 0's scheduling decisions are reproduced identically everywhere
# (same feed, same PRNG), and data-sharded device results are allgathered
# so host slot state stays in lockstep. Outputs must equal the
# single-process greedy decode per request.
from eetq_tpu.serve.engine import Engine
from eetq_tpu.serve.generate import greedy_generate

model_eng = shard_quantized(qp, cfg, mesh)
eng = Engine(model_eng, max_batch=2, max_len=32, prompt_buckets=(8,),
             decode_window=2)
prompts = [[3, 7, 11], [5, 6, 7, 8]]
uids = [eng.add_request(p, max_new_tokens=6) for p in prompts]
eng.run()
for p, u in zip(prompts, uids):
    ref_toks = greedy_generate(
        qp, cfg, jnp.asarray(np.asarray(p, np.int32)[None]), 6
    )
    got = eng.result(u)
    want = [int(t) for t in np.asarray(ref_toks[0])]
    assert got == want, (pid, got, want)
print(f"WORKER {pid} ENGINE OK", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("EETQ_SKIP_MULTIPROC") == "1",
    reason="multi-process test disabled",
)
def test_two_process_initialize_and_collectives(tmp_path):
    worker = tmp_path / "worker.py"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker.write_text(f"REPO = {repo!r}\n" + _WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 local device per process
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(worker), coord, "2", str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER {i} OK" in out, out
        assert f"WORKER {i} ENGINE OK" in out, out
