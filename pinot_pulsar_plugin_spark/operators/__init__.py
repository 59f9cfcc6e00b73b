"""Operator modules. Each module exposes ``QUERIES: dict[str, fn]`` and
``ORACLE: dict[str, str]``; ``registry.py`` merges them for the driver."""
