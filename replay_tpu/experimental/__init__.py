"""Experimental models and scenarios (reference: replay/experimental/).

Research-tier components with the same API as the core zoo but weaker
stability guarantees — mirrored from the reference's experimental package.
"""
