"""REAL multi-process cluster test: 2 JAX processes (Gloo-connected, the
CPU analogue of 2 TPU hosts over DCN) x 2 local devices each, running the
production train step over a 4-wide data mesh.

Validates what the virtual single-process mesh tests cannot: cluster
rendezvous through parallel.distributed.init_distributed_mode, cross-host
param assembly (shard_params via make_array_from_single_device_arrays),
per-host local-batch feeding (shard_batch via
make_array_from_process_local_data - each rank ships only its sampler
slice), XLA cross-process gradient all-reduce, and the host-side
all_reduce_mean logging reduction. Reference semantics: torch DDP +
env:// rendezvous (reference dust3r/training.py:93,152-155).
"""
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# multi-minute file: excluded from the quick (-m quick) suite
pytestmark = pytest.mark.slow

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _reference_losses():
    """Single-device run on the same global batch (ground truth)."""
    from dust3r_tpu.parallel.mesh import make_mesh, shard_params
    from dust3r_tpu.training import init_train_state
    from tests.multihost_common import build_step, make_global_batch

    # 1x1x1 mesh on one local device: same code path, no cross-device
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    step, spec, model, params = build_step(mesh)
    state = init_train_state(shard_params(mesh, params), spec)
    batch = make_global_batch()
    losses = []
    for _ in range(2):
        dev = jax.tree.map(jnp.asarray, batch)
        state, metrics = step(state, dev, jnp.asarray(0.0))
        losses.append(float(metrics["loss"]))
    return losses


def _run_cluster():
    """Launch the 2-process cluster, return (returncodes, outputs)."""
    port = _free_port()
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               DUST3R_TPU_NO_PALLAS="1",
               PYTHONPATH=REPO)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    workers = [
        subprocess.Popen(
            [sys.executable, osp.join(REPO, "tests", "multihost_worker.py"),
             str(rank), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO, env=env)
        for rank in range(2)
    ]
    outs, codes = [], []
    for p in workers:
        try:
            # generous: both workers compile on ONE core on this CI host;
            # a healthy standalone run takes ~190 s end-to-end
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode())
        codes.append(p.returncode)
    return codes, outs


def test_two_process_cluster_matches_single_device(tmp_path):
    codes, outs = _run_cluster()
    if any(codes):
        # Rendezvous infra is load-sensitive on a single-core CI host:
        # Gloo's first-collective KV fetch has a fixed 30 s deadline
        # (DEADLINE_EXCEEDED) and the worker wall-clock cap can fire
        # while both workers compile on one core. Environmental, not a
        # product failure: retry once before judging — a REAL correctness
        # failure (loss mismatch, param divergence) fails both attempts
        # and is still asserted below.
        sys.stderr.write("cluster attempt 1 failed (codes=%r); retrying "
                         "once for load flake\n" % (codes,))
        # keep the first attempt's output visible in CI logs so a real
        # intermittent failure masked by the retry can still be triaged
        for rank, out in enumerate(outs):
            sys.stderr.write(f"--- attempt-1 rank {rank} output ---\n"
                             f"{out}\n")
        codes, outs = _run_cluster()
    for rank, (code, out) in enumerate(zip(codes, outs)):
        assert code == 0, f"rank {rank} failed:\n{out}"

    def field(out, key):
        return [line.split()[1] for line in out.splitlines()
                if line.startswith(key + " ")]

    ref = _reference_losses()
    for rank, out in enumerate(outs):
        # 4 global devices visible from each process
        assert field(out, "PSUM") and field(out, "PSUM")[0] == "4", out
        # all_reduce_mean((1+2)/2) = 1.5 on both ranks
        assert abs(float(field(out, "ALLREDUCE")[0]) - 1.5) < 1e-9, out
        l0 = float(field(out, "LOSS0")[0])
        l1 = float(field(out, "LOSS1")[0])
        np.testing.assert_allclose(l0, ref[0], rtol=2e-5,
                                   err_msg=f"rank {rank} step-0 loss")
        np.testing.assert_allclose(l1, ref[1], rtol=2e-4,
                                   err_msg=f"rank {rank} step-1 loss")
    # both ranks agree on the final (replicated) parameters
    ps = [float(field(out, "PARAMSUM")[0]) for out in outs]
    np.testing.assert_allclose(ps[0], ps[1], rtol=1e-6)
