from osprey_ray.streaming.job import StreamingJob  # noqa: F401
