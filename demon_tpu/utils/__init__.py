"""Shared utilities: profiling/tracing and small helpers.

The reference's observability is a 5-float reader info tensor plus
tf.summary scalars (SURVEY §5); here the equivalents are the reader's
`.info` property, the JSONL metrics logger (train/driver.py), and the
jax profiler wrappers in utils.profiling.
"""

from .profiling import trace, Timer

__all__ = ["trace", "Timer"]
