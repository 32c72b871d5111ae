"""Reusable column-expression function library (JVM-side, codegen-friendly)."""

from .codec import CDC_ENVELOPE, conform_payload, key_struct

__all__ = ["CDC_ENVELOPE", "conform_payload", "key_struct"]
