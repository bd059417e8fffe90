import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from dust3r_tpu.ops.attention import attention_ref
from dust3r_tpu.ops.pallas_attention import fused_attention
rng = np.random.default_rng(0)
B,H,N,d = 16,16,768,64
qb = jnp.asarray(rng.standard_normal((B,H,N,d)), jnp.bfloat16)
kb = jnp.asarray(rng.standard_normal((B,H,N,d)), jnp.bfloat16)
vb = jnp.asarray(rng.standard_normal((B,H,N,d)), jnp.bfloat16)
posb = jnp.asarray(rng.integers(0, 48, (B,N,2)), jnp.int32)
def sync(x): return float(jnp.sum(jnp.ravel(x)[:1]))
f_ref = jax.jit(lambda *a: attention_ref(*a))
f_pal = jax.jit(lambda *a: fused_attention(*a))
for name, f in [("ref", f_ref), ("pallas", f_pal)]:
    out = f(qb,kb,vb,posb,posb); sync(out)
    t0=time.perf_counter()
    for _ in range(20): out = f(qb,kb,vb,posb,posb)
    sync(out)
    dt = (time.perf_counter()-t0)/20
    flops = 2*2*B*H*N*N*d
    print(f"{name}: {dt*1e3:.2f} ms, {flops/dt/1e12:.1f} TFLOP/s", flush=True)
# parity check bf16
ref = attention_ref(qb.astype(jnp.float32),kb.astype(jnp.float32),vb.astype(jnp.float32),posb,posb)
out = fused_attention(qb,kb,vb,posb,posb)
print("bf16 vs fp32-ref max diff:", float(jnp.abs(ref-out.astype(jnp.float32)).max()), flush=True)
