"""Minimal pure-Python stand-in for the Apache Thrift runtime — ONLY the
surface PyHive + thrift-generated TCLIService code touches in NOSASL
binary mode.  This exists so the interop test can run the reference's
OWN client (pyhive + Apache-generated serialization code) against this
repo's thrift frontend without pip-installing `thrift`.  The struct
layouts, field ids, and call sequences all come from the independent
generated code; this shim only provides the byte-level primitives.
Written from the public Thrift binary-protocol spec, not copied."""
