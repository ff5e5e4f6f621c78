from csinn2_tpu.runtime.session import Session, current_session
