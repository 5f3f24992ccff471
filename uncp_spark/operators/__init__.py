"""DataFrame → DataFrame operators — the engine's building blocks.

Each module maps to rows of SURVEY.md §2's operator inventory and cites
the reference behavior it reproduces.
"""
