import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dust3r_tpu.ops.pallas_attention import _attn_kernel, _rope_tables

rng = np.random.default_rng(0)
B,H,N,d = 16,16,768,64
qb = jnp.asarray(rng.standard_normal((B,H,N,d)), jnp.bfloat16)
kb = jnp.asarray(rng.standard_normal((B,H,N,d)), jnp.bfloat16)
vb = jnp.asarray(rng.standard_normal((B,H,N,d)), jnp.bfloat16)
posb = jnp.asarray(rng.integers(0, 48, (B,N,2)), jnp.int32)
def sync(x): return float(jnp.sum(jnp.ravel(x)[:1]))
flops = 2*2*B*H*N*N*d

def variant(dim_sem):
    @jax.jit
    def fn(q,k,v,pos):
        cq, sq = _rope_tables(pos, d, 100.0)
        qf = q.reshape(B*H, N, d); kf = k.reshape(B*H, N, d); vf = v.reshape(B*H, N, d)
        kernel = functools.partial(_attn_kernel, scale=d**-0.5, use_rope=True)
        cp = pltpu.CompilerParams(dimension_semantics=dim_sem) if dim_sem else None
        out = pl.pallas_call(
            kernel, grid=(B*H,),
            in_specs=[pl.BlockSpec((1,N,d), lambda i:(i,0,0), memory_space=pltpu.VMEM)]*3 +
                     [pl.BlockSpec((1,N,d), lambda i,H=H:(i//H,0,0), memory_space=pltpu.VMEM)]*4,
            out_specs=pl.BlockSpec((1,N,d), lambda i:(i,0,0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B*H,N,d), v.dtype),
            compiler_params=cp,
            cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=qf.size*6, transcendentals=B*H*N*N),
        )(qf, kf, vf, cq, sq, cq, sq)
        return out
    return fn

for name, dim_sem in [("baseline", None), ("parallel", ("parallel",)), ("arbitrary", ("arbitrary",))]:
    try:
        f = variant(dim_sem)
        out = f(qb,kb,vb,posb); sync(out)
        t0=time.perf_counter()
        for _ in range(20): out = f(qb,kb,vb,posb)
        sync(out)
        dt=(time.perf_counter()-t0)/20
        print(f"{name}: {dt*1e3:.2f} ms, {flops/dt/1e12:.1f} TFLOP/s", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
print("DONE", flush=True)
