from flash_attn_tpu.serving.server import ServingConfig, serve

__all__ = ["ServingConfig", "serve"]
