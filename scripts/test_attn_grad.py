import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from dust3r_tpu.ops.attention import attention_ref, _attention_pallas_diff

rng = np.random.default_rng(0)
B,H,N,d = 2,4,256,64
q = jnp.asarray(rng.standard_normal((B,H,N,d)), jnp.float32)
k = jnp.asarray(rng.standard_normal((B,H,N,d)), jnp.float32)
v = jnp.asarray(rng.standard_normal((B,H,N,d)), jnp.float32)
pos = jnp.asarray(rng.integers(0, 16, (B,N,2)), jnp.int32)
tang = jnp.asarray(rng.standard_normal((B,H,N,d)), jnp.float32)

def loss_ref(q,k,v):
    return jnp.sum(attention_ref(q,k,v,pos,pos) * tang)
def loss_pal(q,k,v):
    return jnp.sum(_attention_pallas_diff(q,k,v,pos,pos,100.0) * tang)

g_ref = jax.jit(jax.grad(loss_ref, argnums=(0,1,2)))(q,k,v)
g_pal = jax.jit(jax.grad(loss_pal, argnums=(0,1,2)))(q,k,v)
for name, a, b in zip("qkv", g_ref, g_pal):
    diff = float(jnp.abs(a-b).max())
    rel = diff / float(jnp.abs(a).max())
    print(f"d{name}: max abs diff {diff:.6f}, rel {rel:.6f}", flush=True)
# also train-like end-to-end: tiny model grad under pallas
from dust3r_tpu.models.model import AsymmetricCroCo3DStereo
model = AsymmetricCroCo3DStereo(img_size=(32,32), patch_size=16, enc_embed_dim=64,
    enc_depth=2, enc_num_heads=2, dec_embed_dim=64, dec_depth=2, dec_num_heads=2,
    attn_impl="pallas")
img = jax.random.normal(jax.random.PRNGKey(0), (2,32,32,3))
params = jax.jit(model.init)(jax.random.PRNGKey(1), img, img)
def model_loss(p):
    r1, r2 = model.apply(p, img, img)
    return jnp.mean(r1["pts3d"]**2) + jnp.mean(r2["pts3d_in_other_view"]**2)
g = jax.jit(jax.grad(model_loss))(params)
finite = all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))
print("model grad finite under pallas:", finite, flush=True)
print("DONE", flush=True)
