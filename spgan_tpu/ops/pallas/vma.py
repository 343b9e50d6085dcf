"""Varying-manual-axes plumbing for pallas_call outputs.

Inside ``jax.shard_map`` (check_vma=True, the default since jax 0.9) every
``pallas_call`` output must declare which mesh axes it varies over; outside
shard_map the set is empty and the annotation is a no-op.  The correct
declaration is the union of the operands' vma sets — the kernel output
depends elementwise on its operands, so it varies over exactly the axes any
operand varies over (replicated weights contribute nothing).
"""
import jax


def out_struct(shape, dtype, *operands):
    """jax.ShapeDtypeStruct whose vma is the union of the operands'."""
    vma = frozenset()
    for x in operands:
        try:
            vma |= frozenset(jax.typeof(x).vma)
        except (TypeError, AttributeError):
            pass
    try:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    except TypeError:  # older jax: ShapeDtypeStruct has no vma argument
        return jax.ShapeDtypeStruct(shape, dtype)
