"""Scalar + text-analysis column function library."""
