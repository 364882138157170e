"""Pipeline stages: extract, georeference, visualize, plot, aggregate, batch."""
