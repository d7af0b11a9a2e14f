"""Sources: deterministic synthetic corpus (documents + media payloads +
analytic golden outputs), the media store abstraction, and readers."""
