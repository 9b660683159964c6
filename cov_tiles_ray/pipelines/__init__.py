"""End-to-end ray.data.Dataset pipelines."""
