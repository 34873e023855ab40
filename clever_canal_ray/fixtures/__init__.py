from clever_canal_ray.fixtures.generator import (  # noqa: F401
    EventLogSpec,
    generate_events,
    generate_lake,
    write_fixture,
)
