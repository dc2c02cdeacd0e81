import numpy as np
def payload():
    r = np.random.default_rng(5)
    a = r.integers(0, 256, 3000, dtype=np.uint8).tobytes()
    return (b'word soup ' * 800 + b'\x00' * 3000 + a
            + b'A' * 900 + b'period7' * 500)
