"""Utilities: checkpoint IO, metrics, meters, image/mask IO, runtime setup."""
