"""Shared helpers for the Pallas TPU kernels."""
import jax

__all__ = ["out_struct"]


def out_struct(shape, dtype, *operands):
    """Output ShapeDtypeStruct carrying the operands' varying-mesh-axes.

    Under ``jax.shard_map`` (check_vma=True, the default), a pallas_call
    nested inside ``lax.scan``/``lax.map`` must declare which mesh axes its
    output varies over — otherwise "vma on jax.ShapeDtypeStruct must not be
    None" (hit by the chunked pod path, parallel/mesh.py; lesson ffd1809)."""
    vma = frozenset()
    for op in operands:
        vma = vma | frozenset(getattr(jax.typeof(op), "vma", ()) or ())
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)
