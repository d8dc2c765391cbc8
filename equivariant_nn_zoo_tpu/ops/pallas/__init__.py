from .fused_conv import PallasUVUConv, pallas_supported

__all__ = ["PallasUVUConv", "pallas_supported"]
