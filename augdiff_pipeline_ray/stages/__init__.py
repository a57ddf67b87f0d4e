"""Pipeline stages: edge extraction, closure, augment semi-join, history, render, tiles."""
