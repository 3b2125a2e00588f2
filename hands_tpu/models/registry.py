"""Model factory keyed by method name (reference ``src/factory.py:159``)."""

from __future__ import annotations

from hands_tpu.config import Config


def fetch_model(cfg: Config):
    method = cfg.method
    if method in ("hands_light", "hands"):
        from hands_tpu.models.hands_light import HandsLightModel

        return HandsLightModel(cfg)
    if method in ("arctic_sf_light", "arctic_sf"):
        from hands_tpu.models.arctic_light import ArcticSFLightModel

        return ArcticSFLightModel(cfg)
    if method in ("hamer_light", "hamer"):
        from hands_tpu.models.hamer_light import HamerLightModel

        return HamerLightModel(cfg)
    if method in ("handoccnet_light", "handoccnet"):
        from hands_tpu.models.handoccnet_light import HandOccNetLightModel

        return HandOccNetLightModel(cfg)
    raise KeyError(f"unknown method '{method}'")


def inference_pose(model, variables, inputs, meta_info):
    """Single-batch demo inference (reference ``wrapper.inference_pose``,
    src/models/generic/wrapper.py:68-76): run the bound model and return the
    merged ``{inputs.*, pred.*, meta_info.*}`` XDict."""
    from hands_tpu.core.xdict import XDict

    pred = model(variables, inputs, meta_info, train=False)
    out = XDict()
    out.merge(XDict(inputs).prefix("inputs."))
    out.merge(XDict(pred).prefix("pred."))
    out.merge(XDict(meta_info).prefix("meta_info."))
    return out
