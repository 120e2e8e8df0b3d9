"""User-facing error type for the CLI boundary.

The CLI turns UserError (and FileNotFoundError) into a one-line message with
exit code 2; any OTHER exception - including a bare ValueError from deep
numpy/jax shape logic - propagates as a crash with a full traceback (ADVICE
r4: a top-level `except ValueError` was hiding real bugs as "user errors").
Raise UserError only from input validators and config guards whose message
is actionable for the person invoking the tool.
"""


class UserError(ValueError):
    """Invalid user input or configuration (clean CLI message, exit 2)."""
