"""Job specs: declarative source → transforms → sinks composition."""
