"""Export an orbax network checkpoint back to a torch ``.pth`` state_dict.

Inverse of ``convert_torch_weights.py`` (SURVEY.md §5.4): a generator or
discriminator trained HERE becomes a state_dict the reference PyTorch stack
(or any ESRGAN-lineage tool) loads directly — new-style ESRGAN keys for G
(``conv_first`` / ``RRDB_trunk.{i}.RDB{j}.conv{k}`` / ...), the reference's
``conv{b}_{i}``/``bn{b}_{i}``/``linear{1,2}`` names for D. Round-trip
(export -> ``load_rrdb_from_torch``/``load_discriminator_from_torch``) is
exact — ``tests/test_models.py::test_torch_export_roundtrip*``.

Usage::

    python -m esr_tpu.scripts.export_torch_weights --kind rrdb \
        --ckpt experiments/x/models/latest_G --out esrgan_G.pth
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--kind", choices=["rrdb", "discriminator"], required=True)
    parser.add_argument("--ckpt", required=True, help="orbax network checkpoint dir")
    parser.add_argument("--out", required=True, help="output .pth path")
    args = parser.parse_args(argv)

    import orbax.checkpoint as ocp
    import torch

    from esr_tpu.models.networks import discriminator_to_torch, rrdb_to_torch

    variables = ocp.PyTreeCheckpointer().restore(os.path.abspath(args.ckpt))
    if args.kind == "rrdb":
        state = rrdb_to_torch(variables)
    else:
        state = discriminator_to_torch(variables)
    torch.save(
        {k: torch.from_numpy(v.copy()) for k, v in state.items()}, args.out
    )
    print(f"saved {args.kind} state_dict ({len(state)} tensors) -> {args.out}")


if __name__ == "__main__":
    main()
