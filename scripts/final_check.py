import sys, time
sys.path.insert(0, "/root/repo")
import importlib.util
import jax, jax.numpy as jnp

print("== entry() compile check ==", flush=True)
spec = importlib.util.spec_from_file_location("ge", "/root/repo/__graft_entry__.py")
ge = importlib.util.module_from_spec(spec); spec.loader.exec_module(ge)
t0 = time.perf_counter()
fn, args = ge.entry()
out = jax.jit(fn)(*args)
v = float(jnp.sum(out[0][..., 0, 0, :]))
print(f"entry() compiled+ran in {time.perf_counter()-t0:.0f}s, sum={v:.3f}", flush=True)
print("OK", flush=True)
