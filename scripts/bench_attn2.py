import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import functools
from dust3r_tpu.ops.attention import attention_ref
from dust3r_tpu.ops.pallas_attention import fused_attention, _rope_tables

rng = np.random.default_rng(0)
B,H,N,d = 16,16,768,64
qb = jnp.asarray(rng.standard_normal((B,H,N,d)), jnp.bfloat16)
kb = jnp.asarray(rng.standard_normal((B,H,N,d)), jnp.bfloat16)
vb = jnp.asarray(rng.standard_normal((B,H,N,d)), jnp.bfloat16)
posb = jnp.asarray(rng.integers(0, 48, (B,N,2)), jnp.int32)
def sync(x): return float(jnp.sum(jnp.ravel(x)[:1]))
flops = 2*2*B*H*N*N*d

def bench(name, f, *a):
    try:
        out = f(*a); sync(out)
        t0=time.perf_counter()
        for _ in range(20): out = f(*a)
        sync(out)
        dt=(time.perf_counter()-t0)/20
        print(f"{name}: {dt*1e3:.2f} ms, {flops/dt/1e12:.1f} TFLOP/s", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

for G in (1,2,4,8,16):
    f = jax.jit(functools.partial(fused_attention, heads_per_program=G))
    bench(f"pallas G={G}", f, qb,kb,vb,posb,posb)

# jax built-in flash attention (rope applied outside)
try:
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention
    from dust3r_tpu.ops.rope import apply_rope2d
    @jax.jit
    def jflash(q,k,v,pos):
        q = apply_rope2d(q, pos); k = apply_rope2d(k, pos)
        return flash_attention(q, k, v, causal=False, sm_scale=d**-0.5)
    bench("jax flash+rope-outside", jflash, qb,kb,vb,posb)
except Exception as e:
    print("jax flash import failed:", e, flush=True)

# parity of G=4 variant
ref = attention_ref(qb.astype(jnp.float32),kb.astype(jnp.float32),vb.astype(jnp.float32),posb,posb)
out = fused_attention(qb,kb,vb,posb,posb,heads_per_program=4)
print("G=4 bf16 vs fp32-ref max diff:", float(jnp.abs(ref-out.astype(jnp.float32)).max()), flush=True)
print("DONE", flush=True)
