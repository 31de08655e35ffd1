"""Secret masking for logs and error messages (reference:
src/marketpipe/security/mask.py — same ``mask``/``safe_for_log``
semantics: show at most the last 4 characters, collapse short or empty
secrets to ``***`` entirely, and scrub every given secret out of a
message before it reaches a log line or exception text)."""

from __future__ import annotations


def mask(value: str | None, show: int = 4) -> str:
    """``"ABCD1234EFGH"`` → ``"********EFGH"``; short/empty → ``"***"``."""
    if not value or len(value) <= show + 2:
        return "***"
    if show == 0:
        return "*" * len(value)
    return "*" * (len(value) - show) + value[-show:]


def safe_for_log(msg: str, *secrets: str | None) -> str:
    """Replace every occurrence of each secret in ``msg`` with its mask."""
    for secret in secrets:
        if secret:
            msg = msg.replace(secret, mask(secret))
    return msg
