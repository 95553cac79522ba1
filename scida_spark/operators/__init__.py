"""Operators: catalog (segmented/group machinery), spatial, histogram, uid."""
