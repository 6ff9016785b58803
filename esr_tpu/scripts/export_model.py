"""Export a trained model as a serving artifact (AOT StableHLO).

Production-serving path beyond the reference's ship-the-repo deployment
(SURVEY.md §3.2): serialize the exact test-CLI eval forward (CEM projection,
spatial-fold and all — ``BaseModel._make_forward``) per LR shape bucket via
``jax.export``, with weights as an orbax tree alongside::

    python -m esr_tpu.scripts.export_model \
        -opt esr_tpu/options/test/test_explorable.json \
        --shapes 1x128x128,4x128x128,1x256x256 --out /path/artifact_dir

A server then needs only ``esr_tpu.export.load_servable`` (jax + orbax, no
model code, no options JSON)::

    sv = load_servable("/path/artifact_dir")
    sr = sv.sr(lr_float01_nhwc)          # bucket-routed, padded, cropped

``--platforms`` controls lowering targets (default ``cpu,tpu`` so one
artifact serves the TPU fleet and CPU canaries).
"""

from __future__ import annotations

import argparse


def parse_shapes(text: str) -> list[tuple[int, int, int]]:
    shapes = []
    for part in text.split(","):
        dims = [int(x) for x in part.lower().split("x")]
        if len(dims) != 3 or min(dims) < 1:
            raise ValueError(
                f"bad bucket '{part}': expected BATCHxHxW, e.g. 1x128x128"
            )
        shapes.append(tuple(dims))
    return shapes


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-opt", required=True, help="test options JSON (must set path.pretrain_model_G)")
    parser.add_argument("--shapes", default="1x128x128", help="comma-separated LR buckets BATCHxHxW")
    parser.add_argument("--out", required=True, help="artifact output directory")
    parser.add_argument("--platforms", default="cpu,tpu", help="lowering platforms (comma-separated)")
    args = parser.parse_args(argv)

    from esr_tpu import options as options_mod
    from esr_tpu.export import export_servable
    from esr_tpu.models import create_model

    opt = options_mod.parse(args.opt, is_train=False)
    model = create_model(opt)
    manifest = export_servable(
        model,
        parse_shapes(args.shapes),
        args.out,
        platforms=tuple(p.strip() for p in args.platforms.split(",") if p.strip()),
    )
    n = len(manifest["buckets"])
    print(
        f"exported {n} bucket(s) to {args.out} "
        f"(scale x{manifest['scale']}, nz={manifest['nz']}, "
        f"platforms={','.join(manifest['platforms'])})"
    )


if __name__ == "__main__":
    main()
