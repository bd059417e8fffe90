#!/usr/bin/env python3
"""Pointmap parity harness vs the torch reference.

Usage (two machines / two envs):
  1. On a machine with the torch reference + checkpoint:
       python scripts/check_parity.py --make-inputs parity_inputs.npz
     then run the torch reference on those inputs and save
     {pts3d1, conf1, pts3d2, conf2} to reference_outputs.npz.
  2. Here:
       python scripts/check_parity.py --weights ckpt.pth \
           --inputs parity_inputs.npz --reference reference_outputs.npz
     Prints the RMSE per output (BASELINE target: pointmap RMSE <= 1e-2).

Without --reference it just writes our outputs (ours_outputs.npz) for
offline comparison.
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def make_inputs(path, n=4, H=384, W=512, seed=0):
    rng = np.random.default_rng(seed)
    img1 = rng.uniform(-1, 1, (n, H, W, 3)).astype(np.float32)
    img2 = rng.uniform(-1, 1, (n, H, W, 3)).astype(np.float32)
    np.savez(path, img1=img1, img2=img2)
    print(f"wrote {path} (NHWC in [-1,1]; transpose to NCHW for torch)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--make-inputs", type=str, default=None)
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--inputs", type=str, default=None)
    parser.add_argument("--reference", type=str, default=None)
    parser.add_argument("--out", type=str, default="ours_outputs.npz")
    args = parser.parse_args()

    if args.make_inputs:
        make_inputs(args.make_inputs)
        return

    assert args.weights and args.inputs
    import jax
    import jax.numpy as jnp
    from dust3r_tpu.checkpoint import from_pretrained

    model, variables = from_pretrained(args.weights)
    data = np.load(args.inputs)
    img1 = jnp.asarray(data["img1"])
    img2 = jnp.asarray(data["img2"])

    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))
    res1, res2 = fwd(variables, img1, img2)
    ours = dict(pts3d1=np.asarray(res1["pts3d"]),
                conf1=np.asarray(res1["conf"]),
                pts3d2=np.asarray(res2["pts3d_in_other_view"]),
                conf2=np.asarray(res2["conf"]))
    np.savez(args.out, **ours)
    print(f"wrote {args.out}")

    if args.reference:
        ref = np.load(args.reference)
        for k in ("pts3d1", "conf1", "pts3d2", "conf2"):
            d = ours[k] - ref[k]
            rmse = float(np.sqrt(np.mean(d ** 2)))
            print(f"{k}: RMSE {rmse:.5f}  max |diff| {np.abs(d).max():.5f}")
        rmse = float(np.sqrt(np.mean((ours["pts3d1"] - ref["pts3d1"]) ** 2)))
        print("PASS" if rmse <= 1e-2 else "FAIL",
              "(pointmap RMSE target 1e-2)")


if __name__ == "__main__":
    main()
