from multimodalgame_tpu.cli import main

main()
