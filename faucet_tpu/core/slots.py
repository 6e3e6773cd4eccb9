"""Slot conventions for junction nodes — the single source of truth.

A node is a canonical k-mer with 8 extension slots (SURVEY.md §A.3 note:
the reference keeps 5 read-orientation slots, ref:src/Junction.h [C:med];
we keep 8 canonical-orientation slots — symmetric, orientation-free, and
they vectorize as one [..., 8] tensor):

  slot s in 0..3: RIGHT extension — append base s to the canonical form.
  slot s in 4..7: LEFT  extension — prepend base s-4 to the canonical form.

A read traveling left-to-right that crosses node x:
  - exits x rightward via the next read base b. In x's canonical frame
    that edge is slot b when canonical==read orientation, else the
    left-slot of the complement base.
  - enters x from the left via the previous read base c; that edge is x's
    left slot (4+c) when canonical==read orientation, else right slot 3-c.

Travel frames for walks: starting at node x via slot s,
  s < 4  -> travel orientation = canonical form, first appended base = s;
  s >= 4 -> travel orientation = reverse complement of the canonical form,
            first appended base = 3 - (s - 4).
Every walk therefore only ever appends rightward in its own travel frame.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def exit_slot(canon_is_fwd, next_base):
    """Slot of the edge a rightward-traveling read uses to LEAVE a node.

    Works elementwise on arrays (jnp) and on python ints.
    """
    if isinstance(canon_is_fwd, (bool, np.bool_)):
        return int(next_base) if canon_is_fwd else 4 + (3 - int(next_base))
    nb = jnp.asarray(next_base, jnp.int32)
    return jnp.where(canon_is_fwd, nb, np.int32(7) - nb)


def entry_slot(canon_is_fwd, prev_base):
    """Slot of the edge a rightward-traveling read used to ENTER a node."""
    if isinstance(canon_is_fwd, (bool, np.bool_)):
        return 4 + int(prev_base) if canon_is_fwd else 3 - int(prev_base)
    pb = jnp.asarray(prev_base, jnp.int32)
    return jnp.where(canon_is_fwd, np.int32(4) + pb, np.int32(3) - pb)


def opposite_side(slot):
    """True if slot is a left slot (4..7)."""
    if isinstance(slot, (int, np.integer)):
        return slot >= 4
    return jnp.asarray(slot) >= 4


def slot_base(slot):
    """The base appended/prepended by a slot, in canonical frame."""
    if isinstance(slot, (int, np.integer)):
        return slot if slot < 4 else slot - 4
    s = jnp.asarray(slot, jnp.int32)
    return jnp.where(s < 4, s, s - np.int32(4))
