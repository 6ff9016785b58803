from esr_tpu.options.options import NoneDict, check_resume, dict_to_nonedict, parse, save
