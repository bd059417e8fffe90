"""Emit the exact torch-checkpoint key manifest the converter expects.

Real-checkpoint parity is environment-blocked (zero egress - see
PROGRESS.md round-3: huggingface.co does not resolve). This manifest is
the committable half of the evidence: the full key -> shape table of the
reference state dict that `checkpoint.convert_torch_state_dict` consumes
and `to_torch_state_dict` emits, for the published configs
(reference dust3r/model.py README.md:318 dims). When weights become
available, `scripts/validate_real_ckpt.py` is the other half.

Run: XLA_FLAGS=... JAX_PLATFORMS=cpu python scripts/make_ckpt_manifest.py
Writes docs/ckpt_manifest_{512_dpt,224_linear}.json
"""
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from dust3r_tpu.checkpoint import to_torch_state_dict  # noqa: E402
from dust3r_tpu.models.model import (dust3r_224_linear,  # noqa: E402
                                     dust3r_512_dpt)


def manifest(make_model, head_type, img_hw):
    model = make_model()
    img = jnp.zeros((1,) + img_hw + (3,), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), img, img)
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
    sd = to_torch_state_dict(variables, enc_depth=model.enc_depth,
                             dec_depth=model.dec_depth, head_type=head_type)
    return {k: list(v.shape) for k, v in sorted(sd.items())}


def main():
    out_dir = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                       "docs")
    for name, make_model, head_type, hw in (
            ("512_dpt", dust3r_512_dpt, "dpt", (512, 384)),
            ("224_linear", dust3r_224_linear, "linear", (224, 224))):
        m = manifest(make_model, head_type, hw)
        path = osp.join(out_dir, f"ckpt_manifest_{name}.json")
        with open(path, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        n_params = sum(int(jnp.prod(jnp.asarray(s))) for s in m.values())
        print(f"{name}: {len(m)} tensors, {n_params/1e6:.1f}M params "
              f"-> {path}")


if __name__ == "__main__":
    main()
