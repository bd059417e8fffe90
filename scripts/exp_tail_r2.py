"""DPT tail reformulations. The tail after head_conv1 costs 10.4 ms/head:
up2x 1.39 + conv2(cout=32, 4x lane underfill) 4.04 + conv3 0.45 +
postprocess 4.49 (elementwise on a 4-channel tensor = 32x VPU underfill).

Variants:
  tail0: current (up2x -> conv3x3 128->32 -> relu -> conv1x1 32->4 -> post)
  postA: postprocess on split (B,H,W) channel maps instead of (B,H,W,4)
  tail1: phase layout: up2x emitting (H,W,4*128) space-to-depth channels,
         conv2 as (3,3,512,128) with weights EXACTLY rearranged from the
         (3,3,128,32) fine kernel, relu, conv3 as block-diagonal 1x1,
         depth-to-space only for the final 4-channel map, split postprocess.
All variants must agree with tail0 to float tolerance.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dust3r_tpu.models.heads import upsample2x_align_corners, _interp_matrix


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:1]))


def timeit(f, *a, iters=10, rounds=4):
    out = f(*a)
    sync(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        sync(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def post_packed(fmap):  # current: channels-last (B,H,W,4)
    xyz = fmap[..., :3]
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    pts = xyz / jnp.clip(d, 1e-8) * jnp.expm1(d)
    conf = 1.0 + jnp.exp(fmap[..., 3])
    return pts, conf


def post_split(x, y, z, c):  # channel maps (B,H,W) each: lane-dense math
    d = jnp.sqrt(x * x + y * y + z * z)
    s = jnp.expm1(d) / jnp.clip(d, 1e-8)
    pts = jnp.stack([x * s, y * s, z * s], axis=-1)
    conf = 1.0 + jnp.exp(c)
    return pts, conf


def up2x_s2d(x):
    """align_corners 2x upsample emitting phase channels: (B,H,W,C) ->
    (B,H,W,4C), channel order (py, px, c)."""
    B, H, W, C = x.shape
    mh = _interp_matrix(H, 2 * H, x.dtype).reshape(H, 2, H)
    mw = _interp_matrix(W, 2 * W, x.dtype).reshape(W, 2, W)
    y = jnp.einsum("ipj,bjwc->bipwc", mh, x)
    y = jnp.einsum("oqw,bipwc->biopqc", mw, y)
    return y.reshape(B, H, W, 4 * C)


def conv2_weight_s2d(w):
    """(3,3,Cin,Cout) fine conv kernel -> (3,3,4Cin,4Cout) phase kernel.

    out_fine[2i+py, 2j+px, co] = sum_{dy,dx,ci} w[dy+1,dx+1,ci,co] *
        U[2i+py+dy, 2j+px+dx, ci]; with U in (py,px,c) phase channels the
    coarse tap (ay,ax) carries fine offset dy = 2(ay-1) + p - py."""
    Cin, Cout = w.shape[2], w.shape[3]
    wc = np.zeros((3, 3, 2, 2, Cin, 2, 2, Cout), np.float32)
    for ay in range(3):
        for p in range(2):
            for py in range(2):
                dy = 2 * (ay - 1) + p - py
                if abs(dy) > 1:
                    continue
                for ax in range(3):
                    for q in range(2):
                        for px in range(2):
                            dx = 2 * (ax - 1) + q - px
                            if abs(dx) > 1:
                                continue
                            wc[ay, ax, p, q, :, py, px, :] += np.asarray(
                                w[dy + 1, dx + 1])
    return jnp.asarray(wc.reshape(3, 3, 4 * Cin, 4 * Cout))


def conv3_weight_bd(w):
    """(Cin,Cout) 1x1 kernel -> block-diagonal (4Cin, 4Cout) phase kernel."""
    Cin, Cout = w.shape
    wc = np.zeros((2, 2, Cin, 2, 2, Cout), np.float32)
    for p in range(2):
        for q in range(2):
            wc[p, q, :, p, q, :] = np.asarray(w)
    return jnp.asarray(wc.reshape(4 * Cin, 4 * Cout))


def up2x_lerp(x):
    """align_corners 2x upsample via static shifts + per-row lerp weights.

    out[2i]   = eps_i * in[i-1] + (1-eps_i) * in[i],   eps_i = i/(2n-1)
    out[2i+1] = (1-f_i) * in[i] + f_i * in[i+1],       f_i = (n-1-i)/(2n-1)
    No gathers, no matmuls: shifts are static pad+slice, rows interleaved
    by a reshape."""
    B, H, W, C = x.shape
    dt = x.dtype

    def axis_up(t, n, axis):
        i = np.arange(n, dtype=np.float64)
        eps = (i / (2 * n - 1)).astype(np.float32)
        f = ((n - 1 - i) / (2 * n - 1)).astype(np.float32)
        shp = [1, 1, 1, 1]
        shp[axis] = n
        eps = jnp.asarray(eps, dt).reshape(shp)
        f = jnp.asarray(f, dt).reshape(shp)
        up = jnp.concatenate([jax.lax.slice_in_dim(t, 0, 1, axis=axis),
                              jax.lax.slice_in_dim(t, 0, n - 1, axis=axis)],
                             axis=axis)
        dn = jnp.concatenate([jax.lax.slice_in_dim(t, 1, n, axis=axis),
                              jax.lax.slice_in_dim(t, n - 1, n, axis=axis)],
                             axis=axis)
        even = eps * up + (1 - eps) * t
        odd = (1 - f) * t + f * dn
        y = jnp.stack([even, odd], axis=axis + 1)
        new_shape = list(t.shape)
        new_shape[axis] = 2 * n
        return y.reshape(new_shape)

    x = axis_up(x, H, 1)
    x = axis_up(x, W, 2)
    return x


def up2x_phase_lerp(x):
    """align_corners 2x upsample emitting PHASE channels (B,H,W,4C), channel
    order (py,px,c), via static shifts + per-row lerp weights - pure
    elementwise VPU work, no matmuls, no interleave relayout.

    Fine row 2i+0 = eps_i*in[i-1] + (1-eps_i)*in[i],  eps_i = i/(2n-1)
    Fine row 2i+1 = (1-f_i)*in[i] + f_i*in[i+1],      f_i = (n-1-i)/(2n-1)
    (same for columns), so each of the 4 phases is a separable combination
    of x and its +-1 shifts."""
    B, H, W, C = x.shape
    dt = x.dtype

    def weights(n, axis):
        i = np.arange(n, dtype=np.float64)
        eps = (i / (2 * n - 1)).astype(np.float32)
        f = ((n - 1 - i) / (2 * n - 1)).astype(np.float32)
        shp = [1, 1, 1, 1]
        shp[axis] = n
        return (jnp.asarray(eps, dt).reshape(shp),
                jnp.asarray(f, dt).reshape(shp))

    def shift(t, delta, axis):
        n = t.shape[axis]
        if delta == -1:  # t[i-1], edge-clamped (weight is 0 at the edge)
            return jnp.concatenate(
                [jax.lax.slice_in_dim(t, 0, 1, axis=axis),
                 jax.lax.slice_in_dim(t, 0, n - 1, axis=axis)], axis=axis)
        return jnp.concatenate(
            [jax.lax.slice_in_dim(t, 1, n, axis=axis),
             jax.lax.slice_in_dim(t, n - 1, n, axis=axis)], axis=axis)

    eh, fh = weights(H, 1)
    ew, fw = weights(W, 2)
    # H phases
    h0 = eh * shift(x, -1, 1) + (1 - eh) * x
    h1 = (1 - fh) * x + fh * shift(x, 1, 1)
    phases = []
    for hp in (h0, h1):
        w0 = ew * shift(hp, -1, 2) + (1 - ew) * hp
        w1 = (1 - fw) * hp + fw * shift(hp, 1, 2)
        phases += [w0, w1]
    return jnp.concatenate(phases, axis=-1)


def conv2d(x, w, pad=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    print("devices:", jax.devices(), flush=True)
    B, H, W = 8, 192, 256  # input of the tail (after head_conv1)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((B, H, W, 128)), jnp.float32)
    w2 = jnp.asarray(r.standard_normal((3, 3, 128, 32)) * 0.05, jnp.float32)
    b2 = jnp.asarray(r.standard_normal((32,)) * 0.01, jnp.float32)
    w3 = jnp.asarray(r.standard_normal((32, 4)) * 0.05, jnp.float32)
    b3 = jnp.asarray(r.standard_normal((4,)) * 0.01, jnp.float32)

    @jax.jit
    def tail0(x):
        u = upsample2x_align_corners(x)
        o = conv2d(u, w2) + b2
        o = jax.nn.relu(o)
        o = jnp.einsum("bhwc,cn->bhwn", o, w3) + b3
        return post_packed(o)

    @jax.jit
    def tail0_splitpost(x):
        u = upsample2x_align_corners(x)
        o = conv2d(u, w2) + b2
        o = jax.nn.relu(o)
        o = jnp.einsum("bhwc,cn->bhwn", o, w3) + b3
        return post_split(o[..., 0], o[..., 1], o[..., 2], o[..., 3])

    w2c = conv2_weight_s2d(w2)
    b2c = jnp.tile(b2, 4)
    w3c = conv3_weight_bd(w3)
    b3c = jnp.tile(b3, 4)

    @jax.jit
    def tail1(x):
        u = up2x_s2d(x)                      # (B,H,W,512)
        o = conv2d(u, w2c) + b2c             # (B,H,W,128)
        o = jax.nn.relu(o)
        o = jnp.einsum("bhwc,cn->bhwn", o, w3c) + b3c  # (B,H,W,16)
        o = o.reshape(B, H, W, 2, 2, 4)
        o = o.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, 4)
        return post_split(o[..., 0], o[..., 1], o[..., 2], o[..., 3])

    r0 = tail0(x)
    r0s = tail0_splitpost(x)
    r1 = tail1(x)
    for name, rr in (("splitpost", r0s), ("tail1", r1)):
        dp = float(jnp.max(jnp.abs(rr[0] - r0[0])))
        dc = float(jnp.max(jnp.abs(rr[1] - r0[1])))
        print(f"{name}: max|dpts|={dp:.2e} max|dconf|={dc:.2e}", flush=True)

    @jax.jit
    def tail0_bf16(x):
        u = upsample2x_align_corners(x.astype(jnp.bfloat16))
        o = conv2d(u, w2.astype(jnp.bfloat16)) + b2.astype(jnp.bfloat16)
        o = jax.nn.relu(o)
        o = jnp.einsum("bhwc,cn->bhwn", o, w3.astype(jnp.bfloat16)) + b3.astype(jnp.bfloat16)
        o = o.astype(jnp.float32)
        return post_split(o[..., 0], o[..., 1], o[..., 2], o[..., 3])

    rb = tail0_bf16(x)
    dp = float(jnp.max(jnp.abs(rb[0] - r0[0])))
    rel = dp / float(jnp.max(jnp.abs(r0[0])))
    print(f"tail0_bf16: max|dpts|={dp:.2e} (rel {rel:.2e})", flush=True)
    @jax.jit
    def tail2(x):
        u = up2x_lerp(x)
        o = conv2d(u, w2) + b2
        o = jax.nn.relu(o)
        o = jnp.einsum("bhwc,cn->bhwn", o, w3) + b3
        return post_split(o[..., 0], o[..., 1], o[..., 2], o[..., 3])

    r2 = tail2(x)
    dp = float(jnp.max(jnp.abs(r2[0] - r0[0])))
    print(f"tail2: max|dpts|={dp:.2e}", flush=True)
    @jax.jit
    def tail3(x):
        u = up2x_phase_lerp(x)               # (B,H,W,512)
        o = conv2d(u, w2c) + b2c             # (B,H,W,128)
        o = jax.nn.relu(o)
        o = jnp.einsum("bhwc,cn->bhwn", o, w3c) + b3c  # (B,H,W,16)
        o = o.reshape(B, H, W, 2, 2, 4)
        o = o.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, 4)
        return post_split(o[..., 0], o[..., 1], o[..., 2], o[..., 3])

    r3 = tail3(x)
    dp = float(jnp.max(jnp.abs(r3[0] - r0[0])))
    print(f"tail3: max|dpts|={dp:.2e}", flush=True)
    print(f"tail3 (phase lerp): {timeit(tail3, x):7.2f} ms", flush=True)
    print(f"up2x phase lerp   : {timeit(jax.jit(up2x_phase_lerp), x):7.2f} ms", flush=True)
    print(f"up2x matmul alone : {timeit(jax.jit(upsample2x_align_corners), x):7.2f} ms", flush=True)
    print(f"up2x lerp alone   : {timeit(jax.jit(up2x_lerp), x):7.2f} ms", flush=True)
    print(f"tail2 (lerp up)   : {timeit(tail2, x):7.2f} ms", flush=True)
    print(f"tail0 (current)   : {timeit(tail0, x):7.2f} ms", flush=True)
    print(f"tail0 bf16        : {timeit(tail0_bf16, x):7.2f} ms", flush=True)
    print(f"tail0 + splitpost : {timeit(tail0_splitpost, x):7.2f} ms",
          flush=True)
    print(f"tail1 (s2d phase) : {timeit(tail1, x):7.2f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
