"""Ray Data stage functions / actor classes.  Stateless transforms are
plain batch functions; the extraction stage (which holds the OCR engine
and media store) is an actor-pool class."""
