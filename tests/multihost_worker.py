"""Worker process for test_multihost.py: one JAX process of a 2-process
CPU cluster (the DCN-analogue of one TPU host). Run as:

    python multihost_worker.py <rank> <nprocs> <port>

Prints `LOSS0 <v>`, `LOSS1 <v>`, `ALLREDUCE <v>`, `PSUM <n>` lines the
parent asserts against a single-process reference run.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

RANK, NPROCS, PORT = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])


def main():
    import numpy as np
    import jax.numpy as jnp

    from dust3r_tpu.parallel.distributed import (all_reduce_mean, get_rank,
                                                 get_world_size,
                                                 init_distributed_mode)
    from tests.multihost_common import (GLOBAL_BATCH, N_DATA, build_step,
                                        make_global_batch)

    assert init_distributed_mode(f"127.0.0.1:{PORT}", NPROCS, RANK)
    assert get_world_size() == NPROCS and get_rank() == RANK
    n_dev = len(jax.devices())
    print(f"PSUM {n_dev}", flush=True)

    # cross-host scalar logging reduction (reference all_reduce_mean)
    print(f"ALLREDUCE {all_reduce_mean(float(RANK + 1)):.6f}", flush=True)

    from dust3r_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from dust3r_tpu.training import init_train_state

    mesh = make_mesh(n_data=N_DATA)
    step, spec, model, params = build_step(mesh)
    state = init_train_state(shard_params(mesh, params), spec)

    batch = make_global_batch()
    local = GLOBAL_BATCH // NPROCS
    sl = slice(RANK * local, (RANK + 1) * local)

    for i in range(2):
        # each process ships ONLY its rank slice (sampler semantics)
        local_batch = jax.tree.map(lambda x: x[sl], batch)
        dev_batch = shard_batch(mesh, local_batch)
        state, metrics = step(state, dev_batch, jnp.asarray(0.0))
        print(f"LOSS{i} {float(metrics['loss']):.8f}", flush=True)
    leaves = jax.tree.leaves(jax.device_get(
        jax.tree.map(lambda x: jnp.sum(jnp.abs(x.astype(jnp.float64))),
                     state['params'])))
    print(f"PARAMSUM {float(np.sum(leaves)):.6f}", flush=True)


if __name__ == "__main__":
    main()
