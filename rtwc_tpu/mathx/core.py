"""Core math helpers and the pytree-dataclass utility."""
from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax
import jax.numpy as jnp

_T = TypeVar("_T")


def dot(a: jax.Array, b: jax.Array, axis: int = -1) -> jax.Array:
    """Vector dot product along an axis (MyMath.cu:4-14 Dot)."""
    return jnp.sum(a * b, axis=axis)


def normalize(v: jax.Array, axis: int = -1) -> jax.Array:
    """Unchecked normalize, mirroring Normalize_GPU (MyMath.h:139-157):
    no zero-length guard - the GPU path trusts its inputs. Use
    safe_normalize where zero vectors can occur."""
    return v * jax.lax.rsqrt(jnp.sum(v * v, axis=axis, keepdims=True))


def safe_normalize(v: jax.Array, axis: int = -1, eps: float = 1e-20) -> jax.Array:
    """Zero-safe normalize, mirroring the CPU Normalize (MyMath.h:117-135)."""
    sq = jnp.sum(v * v, axis=axis, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(sq, eps))


def pytree_dataclass(cls: type[_T]) -> type[_T]:
    """Register a plain dataclass as a JAX pytree (all fields are leaves).

    Scene / camera state are functional pytrees (SURVEY.md section 7 design
    stance), replacing the reference's GPU-resident object graph
    (Scene3D.h:36-41, Object3D.h:6-12).
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    cls.replace = _replace
    return cls
