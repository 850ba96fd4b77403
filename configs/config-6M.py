# trainer config: 6M model (ref:experiment_setup/config-6M.py values)
model = "6M"
batch_size = 2048
max_iters = 30000
grad_accum = 16
