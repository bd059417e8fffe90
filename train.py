#!/usr/bin/env python3
"""Training CLI (reference-compatible flags; see /root/reference/train.py and
dust3r/training.py:41-90 for the contract)."""
import argparse


def get_args_parser():
    parser = argparse.ArgumentParser("DUSt3R-TPU training", add_help=False)
    parser.add_argument(
        "--model",
        default="AsymmetricCroCo3DStereo(pos_embed='RoPE100', img_size=(224, 224), "
                "head_type='linear', output_mode='pts3d', depth_mode=('exp', -inf, inf), "
                "conf_mode=('exp', 1, inf), enc_embed_dim=1024, enc_depth=24, "
                "enc_num_heads=16, dec_embed_dim=768, dec_depth=12, dec_num_heads=12)",
        type=str, help="model architecture string")
    parser.add_argument("--pretrained", default=None,
                        help="path of a starting checkpoint (.pth)")
    parser.add_argument("--train_criterion",
                        default="ConfLoss(Regr3D(L21, norm_mode='avg_dis'), alpha=0.2)",
                        type=str, help="train criterion")
    parser.add_argument("--test_criterion", default=None, type=str)
    parser.add_argument("--train_dataset", required=True, type=str)
    parser.add_argument("--test_dataset", default="[None]", type=str)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--batch_size", default=64, type=int)
    parser.add_argument("--accum_iter", default=1, type=int)
    parser.add_argument("--epochs", default=800, type=int)
    parser.add_argument("--weight_decay", type=float, default=0.05)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--blr", type=float, default=1.5e-4)
    parser.add_argument("--min_lr", type=float, default=0.0)
    parser.add_argument("--warmup_epochs", type=int, default=40)
    parser.add_argument("--amp", type=int, default=0, choices=[0, 1],
                        help="bf16 compute in the model body")
    parser.add_argument("--scan_layers", type=int, default=0, choices=[0, 1],
                        help="lax.scan over layers (8x faster compiles; "
                             "params stored stacked)")
    parser.add_argument("--remat", type=int, default=0, choices=[0, 1],
                        help="rematerialize block activations in the backward"
                             " pass (fits B=16@224 on a 16G chip)")
    parser.add_argument("--remat_policy", type=str, default="full",
                        choices=["full", "dots"],
                        help="checkpoint policy under --remat 1: 'full' "
                             "recomputes everything; 'dots' saves MXU matmul "
                             "outputs and recomputes only VPU work (faster "
                             "when the config still fits HBM)")
    parser.add_argument("--num_workers", default=8, type=int)
    parser.add_argument("--mesh", default="", type=str,
                        help="device mesh 'data[,fsdp[,model]]' (e.g. '8', "
                             "'4,2', '2,2,2') or 'auto' (all devices on the "
                             "data axis); empty = single device")
    parser.add_argument("--world_size", default=1, type=int,
                        help="deprecated; process count comes from "
                             "jax.distributed (JAX_NUM_PROCESSES)")
    # accepted for reference-CLI drop-in compatibility; no-ops on TPU
    parser.add_argument("--local_rank", default=-1, type=int,
                        help="accepted for CLI parity (torch DDP); unused")
    parser.add_argument("--dist_url", default="env://", type=str,
                        help="accepted for CLI parity (torch DDP); unused")
    parser.add_argument("--disable_cudnn_benchmark", action="store_true",
                        default=False,
                        help="accepted for CLI parity (CUDA); unused")
    parser.add_argument("--eval_freq", type=int, default=1)
    parser.add_argument("--save_freq", default=1, type=int)
    parser.add_argument("--keep_freq", default=20, type=int)
    parser.add_argument("--print_freq", default=20, type=int)
    parser.add_argument("--output_dir", default="./output/", type=str)
    return parser


if __name__ == "__main__":
    args = get_args_parser().parse_args()
    from dust3r_tpu.training import train

    train(args)
