#pragma once
// unused by the compiled subset; include kept satisfied
