from gridfia_ray.codecs.registry import decode_tile, encode_tile  # noqa: F401
