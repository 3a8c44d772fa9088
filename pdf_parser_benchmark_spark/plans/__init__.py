"""End-to-end job plans (the spark-submit entry points)."""
