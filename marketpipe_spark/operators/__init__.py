"""Operator library: each module re-expresses one slice of the reference's
operator inventory (SURVEY §2) as declarative DataFrame plans."""
