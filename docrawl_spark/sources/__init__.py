"""Sources & storage: schemas, fixture generator, snapshot warehouse."""
