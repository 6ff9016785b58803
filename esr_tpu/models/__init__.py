"""Model factory (SURVEY.md §2: ``codes/models/__init__.py`` ::
create_model(opt) — dispatch on ``opt['model']``)."""

from __future__ import annotations

__all__ = ["create_model"]


def create_model(opt: dict):
    model = (opt.get("model") or "sr").lower()
    if model == "sr":
        from esr_tpu.models.sr_model import SRModel

        return SRModel(opt)
    if model in ("srragan", "srgan", "esrgan"):
        from esr_tpu.models.srragan_model import SRRaGANModel

        if model == "srgan":
            # reference SRGAN_model: standard (non-relativistic) adversarial loss
            opt = dict(opt)
            train = dict(opt.get("train") or {})
            train.setdefault("relativistic", False)
            opt["train"] = train
        return SRRaGANModel(opt)
    raise NotImplementedError(f"model {model} not recognized")
