"""Command-line applications (the reference's L7 app surface)."""
