from .core import (
    GroupQuantParams,
    asym_quant_params,
    dequantize_int,
    dequantize_nf3,
    fake_quant_int,
    fake_quant_nf3,
    make_fake_quantizer,
    quantize_int,
    quantize_nf3,
    round_half_away,
    ste_passthrough,
    ste_round,
)
from .packing import (
    PackedLinear,
    dequantize_linear,
    pack_codes,
    quantize_pack_linear,
    unpack_codes,
)

__all__ = [
    "apply_clip_cache",
    "load_clip_cache",
    "run_autoclip",
    "save_clip_cache",
    "search_layer_clip",
    "GroupQuantParams",
    "asym_quant_params",
    "dequantize_int",
    "dequantize_nf3",
    "fake_quant_int",
    "fake_quant_nf3",
    "make_fake_quantizer",
    "quantize_int",
    "quantize_nf3",
    "round_half_away",
    "ste_passthrough",
    "ste_round",
    "PackedLinear",
    "dequantize_linear",
    "pack_codes",
    "quantize_pack_linear",
    "unpack_codes",
]


_AUTOCLIP_NAMES = {
    "apply_clip_cache", "load_clip_cache", "run_autoclip",
    "save_clip_cache", "search_layer_clip", "apply_clip_to_weight",
}


def __getattr__(name):
    # autoclip imports the model layer (for activation capture), which itself
    # imports quant.packing — keep it lazy to avoid the import cycle
    if name in _AUTOCLIP_NAMES:
        from . import autoclip

        return getattr(autoclip, name)
    raise AttributeError(name)
