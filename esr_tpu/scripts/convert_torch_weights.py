"""One-off torch .pth -> orbax converter (SURVEY.md §5.4): ports the
reference's released RRDB/ESRGAN generator checkpoints and torchvision VGG19
ImageNet weights into this framework's param trees for parity evaluation.

Usage::

    python -m esr_tpu.scripts.convert_torch_weights --kind rrdb --pth RRDB.pth --out weights/rrdb_psnr
    python -m esr_tpu.scripts.convert_torch_weights --kind vgg19 --pth vgg19.pth --out weights/vgg19
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--kind", choices=["rrdb", "vgg19", "discriminator"], required=True)
    parser.add_argument("--pth", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--nb", type=int, default=23)
    args = parser.parse_args(argv)

    import torch

    state = torch.load(args.pth, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    state = {k: v.numpy() for k, v in state.items()}

    import jax
    import orbax.checkpoint as ocp

    from esr_tpu.models.networks import (
        load_discriminator_from_torch,
        load_rrdb_from_torch,
        load_vgg19_from_torch,
    )

    if args.kind == "rrdb":
        params = load_rrdb_from_torch(state, nb=args.nb)
    elif args.kind == "discriminator":
        params = load_discriminator_from_torch(state)
    else:
        params = load_vgg19_from_torch(state)
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(args.out), jax.device_get(params), force=True
    )
    print(f"saved {args.kind} params -> {args.out}")


if __name__ == "__main__":
    main()
