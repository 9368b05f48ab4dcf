"""Scalar/pairwise function surface — the reference's `@UserFunction`s."""
