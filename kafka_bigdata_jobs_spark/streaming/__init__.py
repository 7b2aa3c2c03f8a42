"""Streaming layer: windowed aggregation, multi-sink runner, and the
five reference streaming jobs re-expressed as mode-agnostic transforms.
"""
