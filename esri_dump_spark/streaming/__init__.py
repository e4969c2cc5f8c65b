"""Structured Streaming variants of the engine's operators.

The reference has no true streaming (its EventEmitter is a finite
extraction), but the engine's event-time operators are shared between
batch and streaming: the same windowed-aggregate expressions run over
``spark.read`` and ``spark.readStream`` inputs.
"""
