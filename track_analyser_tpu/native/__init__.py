"""Native (C++) runtime tier: decoder + host data pipeline fast paths."""
