"""
Repository config (default dataset path, reference repo_config.py).
"""
DATA_PATH = "data"
