"""RGB-D front-end: feature detection/description, depth processing, cameras."""
