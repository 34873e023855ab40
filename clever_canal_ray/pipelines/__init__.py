from clever_canal_ray.pipelines.replay import plan_batch, replay, replay_batch  # noqa: F401
