"""Custom operators beyond built-in DataFrame primitives.

Most of the engine's operator inventory (SURVEY.md §2) maps to built-in
Catalyst plans and lives in ``plans/``; this package holds the genuinely
custom pieces — multimodal column handling (Pandas-UDF decode plumbing).
"""
