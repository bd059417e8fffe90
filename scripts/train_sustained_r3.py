"""Sustained real-TPU training evidence (VERDICT r3 item 6).

Drives the REAL `train.py` CLI on the real chip with the real threaded
loader on an on-disk Co3d fixture: paper stage-1 config (224_linear,
B=16, symmetrized, scan+remat), >= 400 optimizer steps across two
invocations with a save/auto-resume cycle in between and a test-epoch
eval pass, recording the step-time series.

Run (TPU): python scripts/train_sustained_r3.py [--steps-per-epoch 204]
Output: /tmp/train_sustained_r3/ (checkpoints, log.txt, TB events)
        + a step-time summary on stdout.
"""
import argparse
import json
import os
import os.path as osp
import re
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

MODEL = ("AsymmetricCroCo3DStereo(pos_embed='RoPE100', img_size=(224, 224), "
         "head_type='linear', output_mode='pts3d', "
         "depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf), "
         "enc_embed_dim=1024, enc_depth=24, enc_num_heads=16, "
         "dec_embed_dim=768, dec_depth=12, dec_num_heads=12)")


def make_fixture(root, n_seqs=2, n_frames=100, H=256, W=352):
    import cv2
    import numpy as np

    rng = np.random.default_rng(0)
    focal = 260.0
    selected = {}
    for s in range(n_seqs):
        cat, seq = "apple", f"seq{s}"
        selected.setdefault(cat, {})[seq] = list(range(n_frames))
        base = osp.join(root, cat, seq)
        for sub in ("images", "depths", "masks"):
            os.makedirs(osp.join(base, sub), exist_ok=True)
        for fn in range(n_frames):
            img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            cv2.imwrite(osp.join(base, "images", f"frame{fn:06d}.jpg"), img)
            depth = rng.uniform(1, 4, (H, W)).astype(np.float32)
            mx = float(depth.max())
            cv2.imwrite(osp.join(base, "depths",
                                 f"frame{fn:06d}.jpg.geometric.png"),
                        (depth / mx * 65535).astype(np.uint16))
            mask = (rng.uniform(size=(H, W)) > 0.15).astype(np.uint8) * 255
            cv2.imwrite(osp.join(base, "masks", f"frame{fn:06d}.png"), mask)
            K = np.float32([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]])
            pose = np.eye(4, dtype=np.float32)
            ang = 0.05 * fn
            pose[:3, :3] = np.float32([[np.cos(ang), 0, np.sin(ang)],
                                       [0, 1, 0],
                                       [-np.sin(ang), 0, np.cos(ang)]])
            pose[:3, 3] = rng.standard_normal(3) * 0.1
            np.savez(osp.join(base, "images", f"frame{fn:06d}.npz"),
                     camera_intrinsics=K, camera_pose=pose,
                     maximum_depth=mx)
    for split in ("train", "test"):
        with open(osp.join(root, f"selected_seqs_{split}.json"), "w") as f:
            json.dump(selected, f)


def run_train(out_dir, data_root, epochs, steps_per_epoch, batch_size=16):
    import runpy

    n_samples = steps_per_epoch * batch_size
    argv = [
        "train.py",
        "--model", MODEL,
        "--train_criterion", "ConfLoss(Regr3D(L21, norm_mode='avg_dis'), alpha=0.2)",
        "--test_criterion", "Regr3D_ScaleShiftInv(L21, gt_scale=True)",
        "--train_dataset",
        f"{n_samples} @ Co3d(split='train', ROOT='{data_root}', aug_crop=16, "
        f"mask_bg='rand', resolution=224, transform=ColorJitter, seed=3)",
        "--test_dataset",
        f"128 @ Co3d(split='train', ROOT='{data_root}', resolution=224, "
        f"seed=777)",
        "--batch_size", str(batch_size),
        "--epochs", str(epochs), "--warmup_epochs", "1",
        "--lr", "1e-4", "--min_lr", "1e-6",
        "--scan_layers", "1", "--remat", "1",
        "--num_workers", "8",
        "--save_freq", "1", "--eval_freq", "1", "--print_freq", "10",
        "--output_dir", out_dir,
    ]
    old = sys.argv
    sys.argv = argv
    t0 = time.perf_counter()
    try:
        runpy.run_path(osp.join(REPO, "train.py"), run_name="__main__")
    finally:
        sys.argv = old
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-per-epoch", type=int, default=204)
    ap.add_argument("--out", default="/tmp/train_sustained_r3")
    args = ap.parse_args()

    data_root = osp.join(args.out, "co3d_fixture")
    out_dir = osp.join(args.out, "run")
    os.makedirs(out_dir, exist_ok=True)
    if not osp.exists(osp.join(data_root, "selected_seqs_train.json")):
        print("building fixture ...", flush=True)
        make_fixture(data_root)

    print("=== phase 1: epoch 0 (fresh) ===", flush=True)
    dt1 = run_train(out_dir, data_root, epochs=1,
                    steps_per_epoch=args.steps_per_epoch)
    assert osp.exists(osp.join(out_dir, "checkpoint-last")), \
        "no checkpoint-last written"
    print(f"phase 1 wall: {dt1:.1f}s", flush=True)

    print("=== phase 2: auto-resume -> epoch 1 + eval ===", flush=True)
    dt2 = run_train(out_dir, data_root, epochs=2,
                    steps_per_epoch=args.steps_per_epoch)
    print(f"phase 2 wall: {dt2:.1f}s", flush=True)

    # step-time series from log.txt
    log_path = osp.join(out_dir, "log.txt")
    with open(log_path) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    for rec in lines:
        keys = {k: v for k, v in rec.items()
                if k in ("epoch", "train_loss", "train_lr", "test_loss_med",
                         "train_step_time_med")}
        print("log.txt:", keys, flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
