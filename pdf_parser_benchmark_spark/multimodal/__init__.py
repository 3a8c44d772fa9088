"""Multimodal column handling: opaque binary payloads + typed metadata,
with decode/feature stages as Arrow-batched pandas UDF plumbing.
"""
