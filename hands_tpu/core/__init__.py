from hands_tpu.core.xdict import XDict

__all__ = ["XDict"]
