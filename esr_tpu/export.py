"""AOT model export for serving (jax.export / StableHLO).

The reference deploys by shipping the Python model code plus ``.pth``
weights and re-running ``codes/test.py`` (SURVEY.md §3.2) — every consumer
needs the full framework. The TPU-native production path is ahead-of-time:
the CEM-wrapped eval forward (the exact function the test CLI runs,
``BaseModel._make_forward`` — spatial-fold, CEM projection and all) is
serialized per shape bucket as a portable StableHLO artifact via
``jax.export``, and the weights ride along as an orbax tree. A serving
process loads the artifact directory with :func:`load_servable` — **no
model code, no options JSON, no esr_tpu import beyond this module** — and
gets a padded/bucketed ``sr()`` callable.

Design points:

- **Params are call inputs, not baked constants.** Baking 16.7M flagship
  params into every shape bucket would duplicate ~67 MB per bucket; as
  inputs they are stored once (orbax) and the StableHLO stays ~MBs. The
  exported call signature is ``(params, lr[, z])``.
- **Multi-platform lowering**: ``platforms=("cpu", "tpu")`` by default, so
  one artifact serves both the TPU fleet and CPU canaries. (CUDA consumers
  would add "cuda"; any jax>=export-format-minversion runtime can load it.)
- **Shape buckets** replace dynamic shapes: XLA/TPU wants static shapes
  (SURVEY.md §7 hard-part 6 — same reasoning as ``eval_pad_bucket``).
  :class:`Servable` picks the smallest bucket that fits, edge-pads the LR
  (exactly like ``test.py``'s eval loop), and crops the SR back. CEM
  consistency therefore holds w.r.t. the padded LR, matching eval semantics.
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["export_servable", "load_servable", "Servable", "MANIFEST_NAME"]

MANIFEST_NAME = "manifest.json"
EXPORT_FORMAT_VERSION = 1


def _blob_name(b: int, h: int, w: int) -> str:
    return f"sr_b{b}_h{h}_w{w}.stablehlo"


def export_servable(
    model,
    shapes: list[tuple[int, int, int]],
    out_dir: str,
    platforms: tuple[str, ...] = ("cpu", "tpu"),
) -> dict:
    """Export ``model``'s eval forward for each LR shape bucket.

    model: an SRModel/SRRaGANModel (anything with ``g_module``, ``nz``,
    ``scale``, optional ``cem``, and ``_make_forward()`` — the test-CLI
    eval path). shapes: LR-domain ``(batch, h, w)`` buckets. Returns the
    manifest dict; writes ``out_dir/{manifest.json, params/, *.stablehlo}``.
    """
    import jax
    import orbax.checkpoint as ocp
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    params = jax.device_get(_model_params(model))
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(os.path.join(out_dir, "params")), params, force=True
    )
    params_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), params
    )

    fwd = model._make_forward()
    nz = int(getattr(model, "nz", 0) or 0)
    in_nc = int(getattr(model.g_module, "in_nc", 3))
    entries = []
    for b, h, w in shapes:
        lr_spec = jax.ShapeDtypeStruct((b, h, w, in_nc), np.float32)
        if nz:
            z_spec = jax.ShapeDtypeStruct((b, h, w, nz), np.float32)
            exp = jexport.export(jax.jit(fwd), platforms=platforms)(
                params_spec, lr_spec, z_spec
            )
        else:
            exp = jexport.export(
                jax.jit(lambda p, lr: fwd(p, lr, None)), platforms=platforms
            )(params_spec, lr_spec)
        name = _blob_name(b, h, w)
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        entries.append({"batch": b, "h": h, "w": w, "file": name})

    manifest = {
        "format_version": EXPORT_FORMAT_VERSION,
        "scale": int(getattr(model, "scale", 4)),
        "nz": nz,
        "in_nc": in_nc,
        "platforms": list(platforms),
        "cem": getattr(model, "cem", None) is not None,
        # the exported program IS whatever _make_forward builds — a
        # "self_ensemble": true opt exports the x8 dihedral mean (+1.04 dB
        # at 3.16x on the 12k ckpt, PROGRESS_NOTES r5); recorded here so
        # servers know what they are running
        "self_ensemble": bool(getattr(model, "opt", {}).get("self_ensemble")),
        "buckets": entries,
        "input": "NHWC RGB float32 in [0,1] (LR domain)",
        "output": "NHWC RGB float32 (CEM output is unbounded; clip for PNG)",
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def _model_params(model):
    state = getattr(model, "g_state", None) or model.state
    return state.params


def load_servable(art_dir: str) -> "Servable":
    """Load an exported artifact directory. Needs only jax + orbax — no
    model code, no options."""
    return Servable(art_dir)


class Servable:
    """Callable serving wrapper over an export_servable artifact dir.

    ``sr(lr, z=None)`` accepts an HWC image or NHWC batch (float [0,1]),
    routes it to the smallest fitting shape bucket (edge-padding spatial
    dims, repeating the last image to fill the batch), and returns the SR
    batch cropped back to ``input_shape * scale``. Deserialized functions
    are cached per bucket; first call per bucket pays the XLA compile.
    """

    def __init__(self, art_dir: str):
        import orbax.checkpoint as ocp

        self.dir = art_dir
        with open(os.path.join(art_dir, MANIFEST_NAME)) as f:
            self.manifest = json.load(f)
        if self.manifest["format_version"] > EXPORT_FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.manifest['format_version']} is newer "
                f"than this loader ({EXPORT_FORMAT_VERSION})"
            )
        self.scale = int(self.manifest["scale"])
        self.nz = int(self.manifest["nz"])
        self.params = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(os.path.join(art_dir, "params"))
        )
        self._fns: dict[tuple[int, int, int], object] = {}

    def _bucket_for(self, n: int, h: int, w: int) -> tuple[int, int, int]:
        fits = [
            (e["batch"], e["h"], e["w"])
            for e in self.manifest["buckets"]
            if e["batch"] >= n and e["h"] >= h and e["w"] >= w
        ]
        if not fits:
            have = [(e["batch"], e["h"], e["w"]) for e in self.manifest["buckets"]]
            raise ValueError(
                f"no exported bucket fits LR batch {(n, h, w)}; have {have} — "
                "re-export with a larger bucket"
            )
        return min(fits, key=lambda s: s[0] * s[1] * s[2])

    def _fn(self, bucket: tuple[int, int, int]):
        if bucket not in self._fns:
            from jax import export as jexport

            name = _blob_name(*bucket)
            with open(os.path.join(self.dir, name), "rb") as f:
                self._fns[bucket] = jexport.deserialize(f.read())
        return self._fns[bucket]

    def sr(self, lr: np.ndarray, z: np.ndarray | None = None) -> np.ndarray:
        lr = np.asarray(lr, np.float32)
        if lr.ndim == 3:
            lr = lr[None]
        n, h, w, _ = lr.shape
        b, bh, bw = bucket = self._bucket_for(n, h, w)
        pad = ((0, 0), (0, bh - h), (0, bw - w), (0, 0))
        lr_p = np.pad(lr, pad, mode="edge")
        if b > n:  # repeat the last image to fill the bucket's batch
            lr_p = np.concatenate([lr_p, np.repeat(lr_p[-1:], b - n, axis=0)])
        args = [self.params, lr_p]
        if self.nz:
            if z is None:
                z_p = np.zeros((b, bh, bw, self.nz), np.float32)
            else:
                z = np.asarray(z, np.float32)
                if z.ndim == 3:
                    z = z[None]
                z_p = np.pad(z, pad, mode="edge")
                if b > n:
                    z_p = np.concatenate(
                        [z_p, np.repeat(z_p[-1:], b - n, axis=0)]
                    )
            args.append(z_p)
        elif z is not None:
            raise ValueError("this artifact was exported without latent channels")
        out = np.asarray(self._fn(bucket).call(*args), np.float32)
        s = self.scale
        return out[:n, : h * s, : w * s]
