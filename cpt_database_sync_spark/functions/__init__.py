"""Scalar function packs: numeric-exact helpers, scalar library, type lattice."""
