"""Py3-only stand-in for the `future` compat package (pyhive imports a
few helpers from it)."""
