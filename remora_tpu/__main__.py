from remora_tpu.cli.main import run

run()
