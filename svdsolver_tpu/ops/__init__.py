"""Numerical primitives: Householder reflectors, Givens rotations, compact-WY."""
