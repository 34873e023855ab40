from clever_canal_ray.sources.segments import SegmentQueue, discover_segments  # noqa: F401
