from clever_canal_ray.state.manifest import Lake, Manifest  # noqa: F401
from clever_canal_ray.state.partitioning import partition_ids, stable_hash  # noqa: F401
