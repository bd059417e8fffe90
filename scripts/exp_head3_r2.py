"""In-context DPT head breakdown by truncation: run the REAL head but stop
at successive stages; consecutive differences give each stage's true
in-graph cost (isolated-piece timing in exp_head2 missed ~5 ms)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from dust3r_tpu.models.heads import (DPTHead, FeatureFusionBlock,
                                     upsample2x_align_corners, _PatchExpand,
                                     postprocess)


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


class TruncDPT(DPTHead):
    """DPTHead with a stop stage; mirrors DPTHead.__call__ exactly."""
    stop: str = "full"

    @nn.compact
    def __call__(self, decout, img_shape):
        H, W = img_shape
        p = self.patch_size
        Nh, Nw = H // p, W // p
        nch = 3 + int(self.has_conf)
        dt = self.dtype

        layers = []
        for idx, hook in enumerate(self.hooks):
            t = decout[hook].astype(dt)
            x = t.reshape(t.shape[0], Nh, Nw, t.shape[-1])
            x = nn.Conv(self.layer_dims[idx], (1, 1), dtype=dt,
                        name=f"act_{idx}_proj")(x)
            if idx == 0:
                x = _PatchExpand(self.layer_dims[idx], 4, name="act_0_up4")(x)
            elif idx == 1:
                x = _PatchExpand(self.layer_dims[idx], 2, name="act_1_up2")(x)
            elif idx == 3:
                x = nn.Conv(self.layer_dims[idx], (3, 3), strides=(2, 2),
                            padding=1, dtype=dt, name="act_3_down2")(x)
            x = nn.Conv(self.feature_dim, (3, 3), padding=1, use_bias=False,
                        dtype=dt, name=f"layer{idx + 1}_rn")(x)
            layers.append(x)
        if self.stop == "acts":
            return [jnp.sum(x) for x in layers]

        path4 = FeatureFusionBlock(self.feature_dim, dt, name="refinenet4")(layers[3])
        path4 = path4[:, :layers[2].shape[1], :layers[2].shape[2], :]
        path3 = FeatureFusionBlock(self.feature_dim, dt, name="refinenet3")(path4, layers[2])
        path2 = FeatureFusionBlock(self.feature_dim, dt, name="refinenet2")(path3, layers[1])
        if self.stop == "ref2":
            return jnp.sum(path2)
        path1 = FeatureFusionBlock(self.feature_dim, dt, name="refinenet1")(path2, layers[0])
        if self.stop == "ref1":
            return jnp.sum(path1)

        out = nn.Conv(self.feature_dim // 2, (3, 3), padding=1, dtype=dt, name="head_conv1")(path1)
        if self.stop == "conv1":
            return jnp.sum(out)
        out = upsample2x_align_corners(out)
        if self.stop == "up":
            return jnp.sum(out)
        out = nn.Conv(32, (3, 3), padding=1, dtype=dt, name="head_conv2")(out)
        if self.stop == "conv2":
            return jnp.sum(out)
        out = nn.relu(out)
        out = nn.Conv(nch, (1, 1), dtype=dt, name="head_conv3")(out)
        if self.stop == "conv3":
            return jnp.sum(out)
        out = out.astype(jnp.float32)
        return postprocess(out, self.depth_mode,
                           self.conf_mode if self.has_conf else None)


def main():
    print("devices:", jax.devices(), flush=True)
    B, H, W = 8, 384, 512
    S, D_enc, D_dec = (H // 16) * (W // 16), 1024, 768
    r = np.random.default_rng(0)
    decout = [jnp.asarray(r.standard_normal((B, S, D_enc)), jnp.float32)]
    decout += [jnp.asarray(r.standard_normal((B, S, D_dec)), jnp.float32)
               for _ in range(12)]

    full = TruncDPT(16, ("exp", -np.inf, np.inf), ("exp", 1, np.inf),
                    stop="full")
    params = full.init(jax.random.PRNGKey(0), decout, (H, W))

    prev = 0.0
    for stop in ("acts", "ref2", "ref1", "conv1", "up", "conv2", "conv3", "full"):
        m = TruncDPT(16, ("exp", -np.inf, np.inf), ("exp", 1, np.inf),
                     stop=stop)
        f = jax.jit(lambda p, d, m=m: m.apply(p, d, (H, W)))
        t = timeit(f, params, decout)
        print(f"through {stop:6s}: {t:7.2f} ms  (+{t - prev:5.2f})", flush=True)
        prev = t
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
