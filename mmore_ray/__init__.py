"""mmore_ray — a Ray-Data-native data-processing / KG-construction engine.

A from-scratch rebuild of the query & data-processing capabilities of
swiss-ai/mmore (reference at /root/reference), expressed as idiomatic
Ray Data pipelines: ``ray.data.Dataset`` → ``map_batches`` over zero-copy
Arrow batches, actor pools for stateful stages, ``groupby``/``sort`` for
the wide steps, streaming execution with backpressure.

Layout:
    functions/  pure, vectorizable kernels (text cleaning, hashing, sketches)
    stages/     Ray Data stage callables (stateless fns + actor-pool classes)
    sources/    corpus generation / readers
    pipelines/  end-to-end pipelines (flagship: KG construction)
    state/      lineage manifest + resumable checkpoints
"""

from . import _compat  # noqa: F401  (env shims; see _compat.py)

__version__ = "0.1.0"
