"""Network interpolation (the ESRGAN-lineage ``net_interp.py`` tool).

The ESRGAN recipe (arXiv:1809.00219 §3.4, inherited by the reference repo's
BasicSR ancestry) trades perceptual quality against fidelity by LINEARLY
INTERPOLATING the parameters of a PSNR-oriented generator and a GAN-trained
generator::

    theta_interp = (1 - alpha) * theta_PSNR + alpha * theta_GAN

Both checkpoints must share one param tree (same architecture). Works on our
orbax network artifacts (as written by ``BaseModel.save_network``) and on any
pair of converted torch checkpoints. Usage::

    python -m esr_tpu.scripts.net_interp \
        --model_psnr experiments/rrdb_psnr/models/latest_G \
        --model_gan  experiments/esrgan/models/latest_G \
        --alpha 0.8 --out experiments/esrgan/models/interp_08_G
"""

from __future__ import annotations

import argparse
import os


def interp_trees(tree_a, tree_b, alpha: float):
    """(1-alpha)*a + alpha*b, leaf-wise; trees must be congruent."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda a, b: (1.0 - alpha) * jnp.asarray(a, jnp.float32)
        + alpha * jnp.asarray(b, jnp.float32),
        tree_a,
        tree_b,
    )


def main(argv=None) -> str:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_psnr", required=True,
                        help="PSNR-oriented checkpoint (alpha=0 endpoint)")
    parser.add_argument("--model_gan", required=True,
                        help="GAN-trained checkpoint (alpha=1 endpoint)")
    parser.add_argument("--alpha", type=float, default=0.8)
    parser.add_argument("--out", required=True, help="output checkpoint path")
    args = parser.parse_args(argv)

    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    a = ckptr.restore(os.path.abspath(args.model_psnr))
    b = ckptr.restore(os.path.abspath(args.model_gan))
    if jax.tree.structure(a) != jax.tree.structure(b):
        raise ValueError(
            "checkpoints have different param trees — same architecture "
            f"required ({args.model_psnr} vs {args.model_gan})"
        )
    out = interp_trees(a, b, args.alpha)
    ckptr.save(os.path.abspath(args.out), jax.device_get(out), force=True)
    print(f"saved alpha={args.alpha} interpolation to {args.out}")
    return args.out


if __name__ == "__main__":
    main()
