"""Map projection: occupancy grids from graph + scans."""
